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


def _disable_thp_if_requested() -> None:
    """Opt this process (and every child: JVM → worker daemon → workers)
    out of transparent hugepages via ``prctl(PR_SET_THP_DISABLE)``.

    Why: on this host THP runs in ``madvise`` mode with ``defrag =
    madvise``, so a first touch of freshly mapped memory can enter
    synchronous compaction — measured here at ~2.5 s per ~25 MB of numpy
    temporaries (~400 µs/page) vs ~45 ms with THP disabled, a ~50×
    penalty that made every Arrow-kernel worker's cold allocations the
    dominant cost of the whole ANN/kNN query family. prctl is inherited
    across fork AND execve, so setting it before the JVM spawns covers
    the python workers without any per-worker hook.

    Env-gated (SPARK_GRAFT_DISABLE_THP, default on): on hosts with
    healthy hugepage behavior THP is usually a mild win for GEMM-heavy
    kernels, so production deployments that manage THP at the OS level
    (the normal practice) can flip it off.
    """
    if os.environ.get("SPARK_GRAFT_DISABLE_THP", "1") != "1":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE = 41
    except Exception:
        pass  # non-glibc / non-Linux: nothing to do


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

    # Worker daemon with numpy/pandas/pyarrow preloaded before fork: every
    # Arrow-kernel worker starts warm instead of paying the import cost
    # per worker process (see pydaemon.py; guide §4.5). The package must be
    # importable by the daemon subprocess — exporting the repo root on
    # PYTHONPATH covers the local/bench path where the driver found us via
    # cwd; on a cluster the package ships like any other dependency.
    _repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    if _repo_root not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_repo_root}{os.pathsep}{_pp}" if _pp else _repo_root
        )
    # glibc malloc tuning for the worker tree (inherited: driver → JVM →
    # daemon → workers). Large numpy temporaries otherwise cycle through
    # mmap/munmap + trim, paying a first-touch page fault per 4 KiB on
    # every kernel invocation — measured at ~400 µs/page on this sandbox
    # (3.5 s vs 17 ms for one elementwise pass over an 8 MB matrix; see
    # pydaemon._prewarm). Keeping freed pages on the heap (TRIM -1) and
    # large blocks off mmap makes every kernel call after the first reuse
    # warm pages. Both are no-ops where faults are cheap, and the memory
    # held is bounded by each worker's real peak working set.
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "134217728")
    _disable_thp_if_requested()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.daemon.module", "kafkasparkstream_spark.pydaemon")
        # Python workers are always co-resident with their executor; a unix
        # domain socket skips the TCP/loopback stack for every Arrow batch
        # (measured here: trivial 32-task mapInPandas round-trip 1.0 s →
        # 0.5 s; biggest on sandboxes with virtualized netstacks).
        .config("spark.python.unix.domain.socket.enabled", "true")
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
