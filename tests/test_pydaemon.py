"""The preloaded worker daemon (pydaemon) — wiring + preload effect.

The optimization (OPTIMIZATION_r09.md, guide §4.5): numpy/pandas/pyarrow
import once in the daemon, before fork, so every worker starts warm. These
tests pin (a) the module contract pyspark.daemon expects, and (b) that a
live worker really does see the heavy modules already imported at task
start — i.e. the preload survives the fork and no worker re-imports.
"""

from __future__ import annotations

import os

import pandas as pd


def test_pydaemon_module_contract():
    """pydaemon must expose the wrapped worker_main through pyspark.daemon
    (the daemon resolves it from module globals at call time) and keep the
    manager entry importable."""
    import pyspark.daemon as stock

    import kafkasparkstream_spark.pydaemon as pyd

    # The monkeypatch replaced the module-global the fork path calls.
    assert stock.worker_main is pyd._warm_worker_main
    # Delegation target preserved (stock main still reachable).
    assert pyd._orig_worker_main is not None
    assert callable(stock.manager)


def test_worker_starts_with_heavy_modules_preloaded(spark):
    """A worker forked from the preloaded daemon must have numpy/pandas/
    pyarrow in sys.modules BEFORE the task body imports anything — the
    whole point of the custom daemon module."""
    if spark.conf.get("spark.python.daemon.module", "") != (
        "kafkasparkstream_spark.pydaemon"
    ):
        import pytest

        pytest.skip("session not using the preloaded daemon")

    def probe(it):
        import sys

        # Evaluated at generator start, before touching the batch: were the
        # heavy modules already present when the task began?
        pre = {m: (m in sys.modules) for m in ("numpy", "pandas", "pyarrow")}
        for batch in it:
            yield pd.DataFrame(
                {
                    "mod": list(pre),
                    "preloaded": [pre[m] for m in pre],
                    "pid": [os.getpid()] * len(pre),
                }
            )

    rows = (
        spark.range(4, numPartitions=4)
        .mapInPandas(probe, "mod string, preloaded boolean, pid long")
        .collect()
    )
    assert rows, "probe returned nothing"
    missing = {r.mod for r in rows if not r.preloaded}
    assert not missing, f"workers started without preloaded modules: {missing}"
