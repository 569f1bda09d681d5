"""Deterministic sampling & dataset splitting for training-data pipelines.

Random sampling (`df.sample`, TABLESAMPLE) is irreproducible across engines,
partitionings, and reruns — useless for auditable training splits. These
operators key every decision on a content hash of a stable id column:

- the same row lands in the same split on ANY engine (the DuckDB oracles run
  the identical md5 arithmetic),
- resampling is a pure filter — no shuffle, fully pushed-down-scan friendly,
- rates are exact in expectation and independent per salt (changing the salt
  draws a fresh sample).

At 100 TB a sample/split is a narrow projection+filter over the scan: no
state, no shuffle, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafkasparkstream_spark.functions.hashing import hash_bucket, md5_int


def _hash_bucket(id_col: Column, salt: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) — see functions.hashing for the
    construction and its SQL twin."""
    return hash_bucket(id_col, buckets, salt)


def hash_sample(
    df: DataFrame, id_col: str, rate_pct: int, salt: str = "s0"
) -> DataFrame:
    """Keep ~rate_pct% of rows, deterministically by id hash."""
    return df.filter(_hash_bucket(F.col(id_col), salt) < rate_pct)


def dataset_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split0",
) -> DataFrame:
    """Label every row train/val/test by id-hash bucket (80/10/10 default).

    Returns the input plus a ``split`` column; the split is a function of
    the id alone, so it is stable under reprocessing, repartitioning, and
    incremental appends — the property a training pipeline actually needs.
    """
    b = _hash_bucket(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_hash_sample(
    df: DataFrame, id_col: str, strata_col: str, rates_pct: dict[str, int], salt: str = "s0"
) -> DataFrame:
    """Per-stratum deterministic sampling: each ``strata_col`` value keeps
    its own rate (absent strata keep 0%). The downsample-the-majority-class
    primitive, as one pushable filter expression."""
    b = _hash_bucket(F.col(id_col), salt)
    rate = F.lit(0)
    for value, pct in rates_pct.items():
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)


def sample_k_per_group(
    df: DataFrame, id_col: str, group_col: str, k: int, salt: str = "k0"
) -> DataFrame:
    """Exactly-k-per-group deterministic sample (uniform within group).

    Rank rows inside each group by ``md5(salt || id)`` (id as tiebreak) and
    keep the first ``k`` — a reproducible reservoir: the same k rows
    survive on any engine, any partitioning, any rerun, and adding new
    rows only displaces survivors the hash actually outranks.

    One shuffle on ``group_col``; the rank window never sees more than one
    group per reducer. At 100 TB with a skewed group this is the standard
    top-k-per-key shape — if a single group outgrows a reducer, pre-filter
    with ``hash_sample`` to cap candidates first (documented trade-off).
    """
    from pyspark.sql.window import Window

    from kafkasparkstream_spark.functions.hashing import md5_int

    w = Window.partitionBy(group_col).orderBy(
        md5_int(F.col(id_col), 8, salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .orderBy(group_col, "sample_rank")
    )


def temperature_mixture(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Temperature-resampled source mixture (α = 0.5): the report a
    data-mixing stage uses to rebalance corpora (upweight small sources,
    damp giants — the multilingual-sampling rule with weights ∝ n^α).

    α is fixed at 0.5 so the weight is ``sqrt(n)`` — a correctly-rounded
    IEEE op on every engine (general ``pow`` is not) — then snapped to the
    6-dp grid and summed as decimal so the normalizing total is exact and
    order-independent. One hash-aggregate to |sources| rows; the window
    normalization runs on that tiny aggregate, not the corpus.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.round(F.sqrt(F.col("n_docs")), 6).cast("decimal(18,6)")
    from pyspark.sql.window import Window

    tot = Window.partitionBy()  # |sources| rows — safe single partition
    return (
        counts.withColumn("_w", w)
        .select(
            group_col,
            "n_docs",
            F.round(F.col("n_docs") / F.sum("n_docs").over(tot), 4).alias("raw_share"),
            # decimal sum is exact/order-free; ONE double division at the end
            # is the only inexact op, identical on every IEEE engine.
            F.round(
                F.col("_w").cast("double") / F.sum("_w").over(tot).cast("double"), 4
            ).alias("temp_share"),
        )
        .orderBy(group_col)
    )


def assign_shards(
    df: DataFrame, id_col: str, n_shards: int = 16, salt: str = "shard0"
) -> DataFrame:
    """Deterministic output-shard assignment for training-data export.

    Adds a ``shard`` column in ``[0, n_shards)`` keyed on the content hash
    of the id — the writer-side primitive for producing a fixed number of
    stable training shards: the same doc lands in the same shard on any
    engine, any partitioning, any rerun, and shards are balanced in
    expectation regardless of id distribution (sequential ids would skew a
    range partitioner; the hash doesn't care).

    At 100 TB this is a pure projection; the subsequent
    ``repartition(n_shards, "shard")`` (caller's choice) is the single
    shuffle that materializes shard files.
    """
    return df.withColumn(
        "shard", _hash_bucket(F.col(id_col), salt, n_shards).cast("int")
    )


def shard_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    n_shards: int = 16,
    salt: str = "shard0",
) -> DataFrame:
    """Per-shard balance report over :func:`assign_shards`: doc count,
    payload bytes, and distinct languages — the skew check a shard-writing
    stage runs before committing an export. One hash-agg to n_shards rows."""
    return (
        assign_shards(df, id_col, n_shards, salt)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col).alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
        .orderBy("shard")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    *,
    group_cols: tuple[str, str] = ("lang", "source"),
) -> DataFrame:
    """Sequential-fill sequence packing: concatenate documents (in stable
    id order) into fixed token-budget training sequences, per
    ``group_cols`` stream.

    A doc starts in the sequence its cumulative-token *start offset* falls
    into (``seq_no = floor((cumsum - ntok) / budget)``) — the deterministic
    streaming-packer rule: no bin-packing search, same packing on every
    engine and rerun. Docs longer than the budget spill across the
    boundary, exactly like a token-stream writer.

    The cumulative sum is a keyed window (partition by lang × source), so
    parallelism is the number of corpus streams — at 100 TB each stream
    packs independently; no global sort, no single-partition window. Output
    is one row per packed sequence: doc count, token total, and fill level
    in exact integer basis points of the budget (``fill_bp = seq_tokens *
    10000 // budget`` — integer units on both engines per the repo's
    float-grid convention; a ROUND-on-double here has live half-ties).
    """
    from pyspark.sql.window import Window

    if budget <= 0:
        # seq_no and fill_bp both divide by the budget; 0 would yield
        # NULL-division rows instead of an explainable error.
        raise ValueError(f"pack_sequences budget must be positive, got {budget}")
    ntok = F.size(F.split(F.trim(F.col(text_col)), " +"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        df.withColumn("_ntok", ntok)
        .withColumn("_cum", F.sum("_ntok").over(w))
        .withColumn(
            "seq_no",
            F.floor((F.col("_cum") - F.col("_ntok")) / F.lit(budget)).cast("int"),
        )
    )
    return (
        packed.groupBy(*group_cols, "seq_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("seq_tokens"),
            F.expr(f"sum(_ntok) * 10000L div {int(budget)}").alias("fill_bp"),
        )
        .orderBy(*group_cols, "seq_no")
    )


def quality_weighted_sample(
    docs_with_quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    group_col: str = "lang",
    salt: str = "qw0",
    boost: float = 2.0,
) -> DataFrame:
    """Quality-proportional importance sampling report: a document survives
    with probability ``min(1, boost · quality)``, decided by comparing a
    deterministic per-id uniform (md5 grid, same salt → same survivors on
    any engine/partitioning/rerun) against the scaled score — the standard
    way a curation pipeline upsamples high-quality text without a second
    pass or global state.

    Per-group report: docs in/out, realized keep rate, mean quality before
    vs after (the after-mean must rise — that is the point). One scan +
    one tiny hash-agg; sampling itself never shuffles.
    """
    u = hash_bucket(F.col(id_col), 10000, salt) / F.lit(10000.0)
    keep = u < F.least(F.lit(1.0), F.lit(boost) * F.col(quality_col))
    return (
        docs_with_quality.select(
            F.col(group_col), F.col(quality_col), keep.alias("_keep")
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.round(F.sum(F.col("_keep").cast("long")) / F.count(F.lit(1)), 4).alias(
                "keep_rate"
            ),
            F.round(F.avg(quality_col), 4).alias("avg_quality_before"),
            F.round(
                F.avg(F.when(F.col("_keep"), F.col(quality_col))), 4
            ).alias("avg_quality_after"),
        )
        .orderBy(group_col)
    )


def weighted_reservoir_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    group_col: str,
    k: int = 20,
    salt: str = "wrs0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group, deterministic:
    the Efraimidis–Spirakis exponential race. Each row draws a uniform
    u ∈ (0,1] from the md5 of its id (content-keyed, engine-portable) and
    competes with key ln(u)/w — the top-k keys per group are a true
    w-weighted sample without replacement, computed with ONE window rank
    (no sequential reservoir, no driver state), so the same line works on
    one partition or ten thousand.

    The key is rounded to 9dp before ranking (ties → lowest id) so the
    rank order — not just the key value — is identical on any engine.
    """
    from pyspark.sql.window import Window

    u = (md5_int(F.col(id_col), 8, salt) + F.lit(1)) / F.lit(float(2**32 + 1))
    key = F.round(F.log(u) / weight_col, 9)
    w = Window.partitionBy(group_col).orderBy(F.desc("_wkey"), F.asc(id_col))
    return (
        df.withColumn("_wkey", key)
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )


def mixture_epochs_plan(
    df: DataFrame,
    group_col: str = "source",
    target_lang: str = "en",
    budget_multiple: int = 2,
) -> DataFrame:
    """Static data-mixture plan: given a token budget of ``budget_multiple``
    x the corpus, allocate it across sources in proportion to each source's
    share of *target-language* tokens, and report the per-source epoch count
    that allocation implies — the DoReMi-style "mixture weights -> repeat
    factors" bookkeeping every pretraining run does before sharding.

    Every number is BIGINT arithmetic (integer DIV, basis points, milli-
    epochs), so the plan is bit-reproducible on any engine — a mixture plan
    that drifts between the planner and the sharder silently re-weights the
    corpus. One map-side-combined aggregate to |sources| rows, two 1-row
    broadcasts; nothing here grows with the corpus.

    Columns: ``src_tokens`` (all-language tokens in the source),
    ``lang_tokens`` (target-language tokens), ``weight_bp`` (allocation in
    basis points, floor), ``planned_tokens`` (budget x weight, floor),
    ``epochs_milli`` (planned/src in milli-epochs: 1000 = one pass).
    """
    from kafkasparkstream_spark.operators.text import tokens_col

    per_src = (
        df.select(
            F.col(group_col).alias("grp"),
            F.size(tokens_col("text")).cast("long").alias("n_tok"),
            (F.col("lang") == target_lang).alias("is_t"),
        )
        .groupBy("grp")
        .agg(
            F.sum("n_tok").alias("src_tokens"),
            F.sum(F.when(F.col("is_t"), F.col("n_tok")).otherwise(F.lit(0))).alias(
                "lang_tokens"
            ),
        )
    )
    totals = per_src.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.sum("lang_tokens").alias("total_lang"),
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            F.col("grp").alias(group_col),
            "src_tokens",
            "lang_tokens",
            # total_lang = 0 (no target-language tokens anywhere) must be a
            # deterministic all-zero plan on every engine, not Spark's
            # silent NULL vs DuckDB's division error (r6 ADVICE) — the
            # oracle carries the same CASE guard.
            F.expr(
                "CASE WHEN total_lang = 0 THEN 0 "
                "ELSE lang_tokens * 10000 DIV total_lang END"
            ).alias("weight_bp"),
            F.expr(
                "CASE WHEN total_lang = 0 THEN 0 ELSE "
                f"(total_tokens * {int(budget_multiple)}) * "
                "(lang_tokens * 10000 DIV total_lang) DIV 10000 END"
            ).alias("planned_tokens"),
            F.expr(
                "CASE WHEN total_lang = 0 THEN 0 ELSE "
                f"((total_tokens * {int(budget_multiple)}) * "
                "(lang_tokens * 10000 DIV total_lang) DIV 10000) "
                "* 1000 DIV src_tokens END"
            ).alias("epochs_milli"),
        )
        .orderBy(group_col)
    )
