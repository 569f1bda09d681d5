"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``), but
every setting here is chosen to also hold on a large multi-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) — at
  100 TB the static shuffle-partition count is always wrong for some stage;
  AQE re-plans per stage from actual map-output sizes.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE coalesces.
- UTC session timezone so event-time semantics are reproducible regardless of
  host tz (the reference's producer used naive wall clock,
  data-generator/generator.py:47 — we pin UTC instead).
- Arrow enabled for the Pandas-UDF slow paths (vectorized Python transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "kafkasparkstream-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``); on a
    real cluster callers pass the cluster master / rely on spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Driver-side hygiene for local mode; harmless on a cluster.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession, enable: bool = True) -> None:
    """Switch streaming state stores to RocksDB (off-heap, spill-to-disk).

    The default HDFS-backed store keeps every key in executor JVM heap —
    fine for the reference's ≤30 groups/window, fatal for high-cardinality
    state (per-user dedup/session stores over millions of keys): state
    competes with execution memory and GC pauses scale with store size.
    RocksDB keeps working state in native memory + local SSD with
    incremental checkpointing to the checkpoint location, bounding heap
    regardless of key cardinality — the provider production Spark
    deployments run stateful pipelines on.

    Applies to NEW queries started on this session (each query pins its
    provider at first start via the checkpoint).
    """
    if enable:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
