from __future__ import annotations

import pytest

from kafkasparkstream_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="kss-tests",
        master="local[8]",
        shuffle_partitions=8,
        # stage_task_widths (plans/audit.py) reads per-stage task counts from
        # the status tracker; the default retention (1000 stages) can evict
        # early stages of a long suite run and degrade that audit to a
        # RuntimeWarning — keep every stage of the test session observable.
        extra_conf={
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    yield spark
    spark.stop()
