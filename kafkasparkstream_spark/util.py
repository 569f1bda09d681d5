"""Plan-shaping helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` has enough partitions to use the cluster for a
    compute-heavy downstream stage.

    Small inputs (a single parquet file, a filtered dimension) arrive as one
    split, which serializes any expensive per-row projection or
    nested-loop-join stage onto one core. Repartitioning round-robin to the
    cluster's default parallelism fixes that for the price of one small
    shuffle.

    At scale this is a no-op: inputs with >= default-parallelism partitions
    pass through untouched, so a 100 TB scan (thousands of splits) never pays
    an extra shuffle. Only use upstream of genuinely expensive per-row work —
    cheap projections don't earn their shuffle back.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _persistent_ids(sc) -> set:
    return set(dict(sc._jsc.getPersistentRDDs()).keys())


def free_rdd_ids(sc, ids) -> None:
    """Unpersist the given internal RDD ids (from `checkpoint_tracked`).
    The DataFrames backed by those blocks become permanently unusable —
    free only tables no future job will read."""
    pm = dict(sc._jsc.getPersistentRDDs())
    for rid in ids:
        jrdd = pm.get(rid)
        if jrdd is not None:
            try:
                jrdd.unpersist()
            except Exception:
                pass


def checkpoint_tracked(
    df: DataFrame, reliable: bool = False, eager: bool = True
) -> tuple[DataFrame, set]:
    """``localCheckpoint`` + the ids of the blocks it pinned, so callers can
    free them deterministically (``Dataset.unpersist`` is a no-op for
    checkpoint blocks — they otherwise live until driver GC).

    ``reliable=True`` swaps in a reliable ``checkpoint()`` to the session's
    checkpoint dir (``sparkContext.setCheckpointDir`` must have been
    called): survives executor loss on preemptible clusters, costs a
    write+read of the table per round. No executor blocks are pinned in
    that mode, so the returned free-set is empty; superseded round files
    are removed by Spark's reference-tracking cleaner
    (``spark.cleaner.referenceTracking.cleanCheckpoints``) or checkpoint-dir
    TTL hygiene, not by ``free_rdd_ids``.

    Not safe under concurrent checkpoint activity on the same session (the
    id set is computed by before/after diff); the iterative operators using
    this run their loops synchronously.

    ``eager=False`` defers materialization to the caller's next action on
    the returned frame (``RDD.persist`` registers the block ids immediately,
    so the tracked free-set is complete either way) — lets an iterative loop
    fold its convergence-check aggregate into the materialization job
    instead of paying a separate job per round. Local mode only (reliable
    checkpoints stay eager).
    """
    sc = df.sparkSession.sparkContext
    if reliable:
        if sc._jsc.sc().checkpointDir().isEmpty():
            raise ValueError(
                "reliable checkpoint mode requires "
                "spark.sparkContext.setCheckpointDir(...) to be set"
            )
        return df.checkpoint(eager=True), set()
    before = _persistent_ids(sc)
    out = df.localCheckpoint(eager=eager)
    return out, _persistent_ids(sc) - before


class LocalCheckpointer:
    """Rolling localCheckpoint for iterative algorithms: every ``step``
    checkpoints the new round's table (truncating lineage so round k's plan
    stays shallow) and frees the blocks of the superseded round — executor
    storage stays O(1) in iteration count instead of accumulating a dead
    table per round. The FINAL round's blocks are intentionally left live
    (the caller returns a result built on them); ``handle()`` exposes an
    unpersist-able object for deferred release.

    ``history`` is how many PAST rounds stay readable after a ``step``: the
    default 1 keeps round k-1 alive when round k lands (so a convergence
    check may still join new vs old after stepping) and frees round k-2 —
    storage is bounded at history+1 tables regardless of iteration count.
    """

    def __init__(self, spark, history: int = 1, reliable: bool = False):
        self._sc = spark.sparkContext
        self._past: list[set] = []
        self._history = max(1, history)
        self._reliable = reliable

    def step(self, df: DataFrame, eager: bool = True) -> DataFrame:
        # eager=False: the caller's next action materializes the round —
        # safe with the free ladder because round k's truncated lineage
        # reads only round k-1's blocks, which history >= 1 keeps alive.
        out, new = checkpoint_tracked(df, reliable=self._reliable, eager=eager)
        self._past.append(new)
        while len(self._past) > self._history + 1:
            free_rdd_ids(self._sc, self._past.pop(0))  # superseded, unread
        return out

    def handle(self):
        sc = self._sc
        ids = set().union(*self._past) if self._past else set()

        class _Handle:
            def unpersist(self):
                free_rdd_ids(sc, ids)

        return _Handle()
