"""Windowed & grouped aggregates — the reference's flagship computation.

The reference's heart is a 1-minute tumbling-window multi-aggregate grouped by
low-cardinality dimensions (spark-processor/processor.py:82-95, operator S10 in
SURVEY.md §2.4). ``windowed_agg`` is its exact batch shadow; the streaming
variant (same expression tree plus a watermark) lives in
``kafkasparkstream_spark.streaming.pipeline``.

Scale notes (100 TB): a groupBy on (window, dims) shuffles once on the full
group key; Spark plans partial (map-side) aggregation before the exchange, so
the shuffle carries one row per (partition × group), not per event — with
30-ish dim groups per window this is tiny regardless of input size. No salting
needed: the window key grows with time, so keys don't concentrate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Decimal places used when a query must emit float aggregates whose exact bit
#: pattern depends on summation order (avg/sum of doubles). Rounding both the
#: Spark result and the oracle to the same grid makes hashes comparable.
FLOAT_DP = 4


def value_units(value_col: str | Column, scale: int = 2) -> Column:
    """Exact integer representation of a fixed-point column: ``value·10^scale``
    rounded at scale 0 and cast to long.

    ``ROUND(v*100, 0)`` is portable across engines (scale-0 rounding of the
    SAME IEEE product), and for data that is 2dp by construction (monetary
    amounts, the synthetic ``events.value``) the result is the exact integer
    the decimal denotes — so sums over it are order-independent, unlike sums
    of the raw doubles. Oracle twin: ``CAST(ROUND(v*100, 0) AS BIGINT)``.
    """
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    # rint, not round: Catalyst's ROUND(double, 0) allocates a BigDecimal
    # per row (~30% on a fact-scan aggregate, measured); Math.rint is an
    # intrinsic and identical here — a fixed-point value ×10^scale sits
    # within an ulp of its integer, never on a true .5, so banker's vs
    # half-up cannot differ. The ORACLE keeps ROUND(v*100, 0): equal on
    # every such input.
    return F.rint(c * (10 ** scale)).cast("long")


def grid_avg(sum_units: Column, n: Column, scale: int = 2, dp: int = FLOAT_DP) -> Column:
    """Order-independent ``dp``-decimal average from an exact integer sum.

    Both engines divide the SAME exact integers and round the SAME double at
    scale 0 — the only ROUND that is portable (Spark's BigDecimal half-up and
    DuckDB's round() agree away-from-zero at integer grain; at k>0 digits
    they diverge on .5 boundaries, the bug class this helper exists to kill).
    Oracle twin: ``ROUND(SUM(vq) * 10^(dp-scale) * 1.0 / COUNT(*), 0) / 10^dp``.
    """
    up = float(10 ** (dp - scale))
    return F.round(sum_units * up / n, 0) / float(10 ** dp)


def windowed_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    value_scale: int | None = 2,
) -> DataFrame:
    """Tumbling-window multi-aggregate (S10 batch shadow, processor.py:82-95).

    Returns one row per (window, *dims) with avg/min/max of ``value_col`` and
    the row count, window struct flattened to ``window_start``/``window_end``
    (mirroring what the reference's JDBC write does, api-service/app.py:93-94).

    ``value_scale`` (default 2 — cents) computes the average on the exact
    integer grid (:func:`value_units` / :func:`grid_avg`), which makes it
    independent of partial-sum order: the 1-minute windows are small-n groups
    whose float averages otherwise land on 4dp round boundaries and flip
    between engines/runs (found by the sf1.0 replica-corpus sweep). Pass
    ``None`` for data that is not fixed-point.
    """
    if value_scale is None:
        avg_c = F.round(F.avg(value_col), FLOAT_DP).alias("avg_value")
        post_avg = F.col("avg_value")
    else:
        avg_c = F.sum(value_units(value_col, value_scale)).alias("_sum_units")
        post_avg = grid_avg(
            F.col("_sum_units"), F.col("reading_count"), value_scale
        ).alias("avg_value")
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration), *[F.col(d) for d in dims])
        .agg(
            avg_c,
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.count(F.lit(1)).alias("reading_count"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *dims,
            post_avg,
            "min_value",
            "max_value",
            "reading_count",
        )
    )


def sensor_windowed_agg(df: DataFrame) -> DataFrame:
    """The reference's exact aggregate set over a sensor-shaped frame
    (avg/min/max value, avg battery, count — processor.py:89-95)."""
    return (
        df.groupBy(
            F.window(F.col("timestamp"), "1 minute"),
            F.col("device_type"),
            F.col("location"),
        )
        .agg(
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.avg("battery_level").alias("avg_battery"),
            F.count(F.lit(1)).alias("reading_count"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "device_type",
            "location",
            "avg_value",
            "min_value",
            "max_value",
            "avg_battery",
            "reading_count",
        )
    )


def group_count(df: DataFrame, dim: str) -> DataFrame:
    """Group-count + sort-by-count (A6/A7, api-service/app.py:251-266).

    Deterministic total order: count desc, then dim asc as tiebreaker.
    """
    return (
        df.groupBy(dim)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(dim))
    )


def total_count(df: DataFrame) -> DataFrame:
    """Ungrouped COUNT(*) (A5, api-service/app.py:247-248)."""
    return df.agg(F.count(F.lit(1)).alias("total_count"))


def time_range(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """MIN/MAX over the event-time column (A8, api-service/app.py:269-275)."""
    return df.agg(
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
    )


def salted_group_agg(
    df: DataFrame,
    key_col: str,
    value_col: str = "value",
    salt_col: str = "event_id",
    buckets: int = 16,
) -> DataFrame:
    """Skew-resistant two-phase aggregate: phase 1 groups on
    (key, hash(salt_col) % buckets) so a hot key's rows split across
    ``buckets`` reducers; phase 2 merges the partials on the key alone.

    count/sum/min/max are all decomposable, so the merge is exact. With AQE
    skew handling this is rarely needed for joins, but a single pathological
    group-by key (one tenant = 40% of rows) still serializes its final
    reduce — salting caps any reducer's share at 1/buckets of the hot key.
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(salt_col)), F.lit(buckets)))
    # Partials carry exact integer cents: a float partial sum would make the
    # merged total depend on which salt bucket each row landed in.
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(value_units(value_col)).alias("_sum_c"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
    )
    return (
        partial.groupBy(key_col)
        .agg(
            F.sum("_cnt").alias("cnt"),
            (F.sum("_sum_c").cast("double") / 100.0).alias("sum_value"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
        )
        .orderBy(key_col)
    )


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    salt_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, replicate the dim side.

    A shuffle join keyed on a skewed column sends the hot key's entire fact
    partition to ONE reducer — the straggler that gates the stage at 100 TB.
    Salting splits the hot key across ``buckets`` reducers: the fact rows
    get a deterministic per-row salt (``hash(salt_col) % buckets`` — pass a
    row-unique column, e.g. the fact's id; never a random, which breaks
    task-retry determinism), the dim side is replicated once per bucket via
    ``explode(sequence(...))``, and the join runs on (key, salt). Dim-side
    cost: ``buckets ×`` its row count — use for genuinely dim-sized right
    sides that are still too big (or too mid-plan) to broadcast.

    Prefer, in order: ``broadcast(dim)`` when it fits; AQE's
    ``skewJoin.enabled`` (splits oversized partitions at runtime) when a
    shuffle join is unavoidable; this operator when the skew is known ahead
    of time and per-key (AQE splits partitions, not keys — a single key
    bigger than one executor's memory still needs key-level salting).
    ``scripts/skew_bench.py`` measures all three on a 50%-hot-key fixture.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    f = fact.withColumn("_salt", F.pmod(F.hash(F.col(salt_col)), F.lit(buckets)))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, [key_col, "_salt"], how).drop("_salt")


def distribution_stats(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    aux_col: str = "user_id",
) -> DataFrame:
    """Exact order statistics + moments per group: median, p95 (exact
    interpolated percentile — Catalyst's `percentile`, not the approximate
    sketch), sample stddev, and correlation against ``aux_col``.

    At 100 TB exact percentiles buffer each group's values on its reducer —
    swap `percentile` for `approx_percentile(…, accuracy)` when groups stop
    fitting; the query shape is unchanged.
    """
    return (
        df.groupBy(key_col)
        .agg(
            F.round(F.expr(f"percentile({value_col}, 0.5)"), FLOAT_DP).alias("p50"),
            F.round(F.expr(f"percentile({value_col}, 0.95)"), FLOAT_DP).alias("p95"),
            F.round(F.stddev_samp(value_col), FLOAT_DP).alias("stddev_value"),
            F.round(F.corr(value_col, F.col(aux_col).cast("double")), 6).alias("corr_value_aux"),
        )
        .orderBy(key_col)
    )


def profile_table(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Column-level data profile: null count and exact distinct count per
    column, one output row per column.

    One pass per column pair of aggregates, unioned — at 100 TB swap the
    exact ``countDistinct`` for ``approx_count_distinct`` (same shape) or
    compute all columns in a single pass with ``count(DISTINCT)`` grouping
    sets if the table is scanned once anyway.
    """
    parts = [
        df.select(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column")


def resample_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid per key with
    forward fill — the hypertable/"gap fill" operator.

    Plan: per-key per-bucket average (one shuffle) → per-key span →
    ``sequence()`` explode generates the dense grid (no driver loop) →
    left join actual points → ``last(ignoreNulls)`` carries the previous
    value across gaps. Grid generation is O(span/unit) rows per key,
    produced distributed; the only shuffles are the bucket agg and the
    key-partitioned fill window.
    """
    from pyspark.sql.window import Window

    bucket = F.date_trunc(unit, F.col(ts_col))
    pts = (
        df.groupBy(F.col(key_col), bucket.alias("bucket"))
        .agg(F.avg(value_col).alias("_v"))
    )
    span = pts.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        key_col,
        F.explode(F.sequence("_b0", "_b1", F.expr(f"INTERVAL 1 {unit}"))).alias("bucket"),
    )
    joined = grid.join(pts, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.col("bucket"),
        F.round(F.last("_v", ignorenulls=True).over(w), 4).alias("value_ffill"),
        F.col("_v").isNull().alias("is_gap"),
    ).orderBy(key_col, "bucket")


def value_histogram(df: DataFrame, value_col: str = "value", bucket_width: float = 10.0) -> DataFrame:
    """Fixed-width histogram: bucketize then count — the width_bucket shape.

    The bucket id is a pure projection, so this is a single map-side-combined
    aggregate on O(range/width) keys; at 100 TB the exchange carries one row
    per (partition × bucket)."""
    bucket = F.floor(F.col(value_col) / F.lit(bucket_width)).cast("int")
    return (
        df.select(bucket.alias("bucket"), F.col(value_col))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min(value_col), FLOAT_DP).alias("min_value"),
            F.round(F.max(value_col), FLOAT_DP).alias("max_value"),
            F.sum(value_units(value_col)).alias("_sc"),
        )
        .select(
            "bucket",
            "cnt",
            "min_value",
            "max_value",
            grid_avg(F.col("_sc"), F.col("cnt")).alias("avg_value"),
        )
        .orderBy("bucket")
    )


def window_partials(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Decomposable per-window partial aggregates: (sum, count, min, max)
    — every component merges associatively, so partials from independent
    ingest batches combine into the exact full answer (avg is derived at
    read time as sum/count). This is the batch form of incremental view
    maintenance: a new day's partition appends its partials; nothing old
    is ever recomputed.

    The value sum is carried as exact integer cents (:func:`value_units`) —
    a float partial sum would make the merged average depend on which batch
    each row arrived in (and on partial-sum order inside each batch)."""
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration), *[F.col(d) for d in dims])
        .agg(
            F.sum(value_units(value_col)).alias("sum_cents"),
            F.count(F.lit(1)).alias("cnt"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *dims,
            "sum_cents",
            "cnt",
            "min_value",
            "max_value",
        )
    )


def merge_window_partials(
    *parts: DataFrame, dims: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Merge partial-aggregate tables into final per-window stats. The
    merge is the same shuffle a fresh aggregate would need — but over
    partial rows (one per window×dims per batch), orders of magnitude
    smaller than the events that produced them."""
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    keys = ["window_start", "window_end", *dims]
    return (
        merged.groupBy(*keys)
        .agg(
            F.sum("sum_cents").alias("_sum_cents"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("cnt").alias("reading_count"),
        )
        .select(
            *keys,
            grid_avg(F.col("_sum_cents"), F.col("reading_count")).alias("avg_value"),
            "min_value",
            "max_value",
            "reading_count",
        )
        .orderBy(*keys)
    )


def distinct_sketch_partials(
    df: DataFrame,
    dim_col: str = "event_type",
    id_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count state per dimension: a Datasketches HLL
    sketch of ``id_col`` per ``dim_col`` — the incremental-view-maintenance
    analog of :func:`window_partials` for COUNT(DISTINCT), which has no
    decomposable sum/count form.

    Each batch reduces to |dims| sketch blobs (~2^lg_k bytes each) that
    :func:`merge_distinct_sketches` unions with history — re-counting
    distinct users over a year of data costs one union of per-day sketches,
    never a rescan. Standard error ~1.04/√2^lg_k (±1.6% at lg_k=12).
    """
    return df.groupBy(dim_col).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_distinct_sketches(*partials: DataFrame) -> DataFrame:
    """Union per-batch HLL partials into current distinct estimates per
    dimension: one hash-agg over |batches|·|dims| sketch rows — map-side
    combinable, independent of fact cardinality."""
    import functools

    all_parts = functools.reduce(lambda a, b: a.unionByName(b), partials)
    return (
        all_parts.groupBy(all_parts.columns[0])
        .agg(
            F.hll_union_agg("sketch").alias("merged"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            all_parts.columns[0],
            F.hll_sketch_estimate("merged").alias("approx_distinct"),
            "n_rows",
        )
    )


def rolling_active_users(
    df: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing N-day active-user count per day (the DAU/WAU curve).

    COUNT(DISTINCT) cannot ride a sliding window frame, so the scalable
    shape is: collapse to distinct (user, active_day) — one hash-agg that
    shrinks the fact table to at most |users|·|days| rows — then explode
    each activity day into the ≤N report days it contributes to and
    hash-agg a distinct count per report day. The explode multiplies the
    ALREADY-COLLAPSED grain by N, never the event stream; both exchanges
    are keyed and bounded by users×days. Report days are clipped to the
    observed range so every row reflects a full window's reach.
    """
    active = (
        df.select(F.col(key_col), F.to_date(ts_col).alias("_day")).distinct()
    )
    bounds = active.agg(F.max("_day").alias("_max_day"))
    contributes = active.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("_day"),
                F.date_add(F.col("_day"), window_days - 1),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    return (
        contributes.join(F.broadcast(bounds))
        .filter(F.col("report_day") <= F.col("_max_day"))
        .groupBy("report_day")
        .agg(F.countDistinct(key_col).alias(f"active_{window_days}d"))
        .orderBy("report_day")
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str = "value",
    bucket_width: float = 50.0,
    lo: float = 0.0,
    hi: float = 1000.0,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift alarm for feature/label distributions
    (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate).

    Fixed-width buckets (clamped to [lo, hi]) keep the report deterministic
    and engine-independent — quantile edges would drift with the data and
    between engines. Each side is one scan → hash-agg to |buckets| rows;
    the PSI sum is a |buckets|-row join + 1-row aggregate. Empty buckets
    take a 0.5-count smoothing so the log-ratio stays finite.
    """
    def bucketize(df: DataFrame, name: str) -> DataFrame:
        b = F.floor(
            (F.least(F.greatest(F.col(value_col), F.lit(lo)), F.lit(hi - 1e-9)) - F.lit(lo))
            / F.lit(bucket_width)
        ).cast("int")
        return df.select(b.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(name)
        )
    o = bucketize(old, "n_old")
    n = bucketize(new, "n_new")
    joined = o.join(n, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = joined.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    smoothed = joined.join(F.broadcast(tot)).select(
        "bucket",
        "n_old",
        "n_new",
        ((F.col("n_old") + F.lit(0.5)) / (F.col("t_old") + F.lit(0.5))).alias("p_old"),
        ((F.col("n_new") + F.lit(0.5)) / (F.col("t_new") + F.lit(0.5))).alias("p_new"),
    )
    per_bucket = smoothed.select(
        "bucket",
        "n_old",
        "n_new",
        F.round((F.col("p_new") - F.col("p_old")) * F.log(F.col("p_new") / F.col("p_old")), 6).alias(
            "psi_term"
        ),
    )
    return per_bucket.orderBy("bucket")


def rolling_active_users_sketch(
    df: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """The 100 TB swap for :func:`rolling_active_users`: ONE per-day HLL
    sketch (a keyed hash-agg that collapses the fact table to |days| blob
    rows) unioned over a trailing day-range window, instead of exploding
    the users×days grain. The window runs over report-day cardinality —
    hundreds of rows — so its single-partition sort is the same sanctioned
    post-aggregation shape as the ntile report, while the data-sized work
    is exactly one exchange of |days| sketches. Estimates carry the sketch
    error (~1.6% at lg_k=12); ``range``-framed on the day number so
    calendar gaps don't slip extra days into the window.
    """
    from pyspark.sql.window import Window

    daily = (
        df.select(F.to_date(ts_col).alias("report_day"), F.col(key_col))
        .groupBy("report_day")
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("_sk"))
        .withColumn("_daynum", F.datediff("report_day", F.lit("1970-01-01")))
    )
    w = (
        Window.orderBy("_daynum")
        .rangeBetween(-(window_days - 1), 0)
    )
    return (
        daily.select(
            "report_day",
            F.hll_sketch_estimate(F.hll_union_agg("_sk").over(w)).alias(
                f"approx_active_{window_days}d"
            ),
        )
        .orderBy("report_day")
    )


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch frequency estimation, built relationally: ``depth``
    md5 hash rows map each key to a bucket in ``[0, width)``; bucket
    counters are one hash aggregate; a key's estimate is the MIN of its
    ``depth`` counters (always ≥ the true count — collisions only inflate).

    Why it matters at 100 TB: the (depth × width) counter table is a few KB
    regardless of key cardinality, the partial counters merge by addition
    (mergeable across batches/partitions like the HLL sketches in this
    module), and heavy hitters survive collisions by construction. Unlike
    native sketch libraries, the md5 construction is engine-portable, so
    the DuckDB oracle reproduces every counter — and therefore every
    estimate — bit-for-bit.

    Returns (key, true_cnt, cms_est) per distinct key; ``cms_est >=
    true_cnt`` is the sketch's guarantee and is asserted in tests.
    """
    from kafkasparkstream_spark.functions.hashing import md5_int

    # One fact scan: the per-key exact counts. Counters derive from THIS
    # aggregate (bucket count = Σ true_cnt of keys hashing there), so md5
    # work is proportional to distinct keys, not total rows.
    keys = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .withColumn("_row", F.explode(F.array(*[F.lit(i) for i in range(depth)])))
        .withColumn(
            "_bucket",
            F.pmod(md5_int(F.concat(F.col("_row"), F.lit("_"), F.col(key_col)), 8, salt), F.lit(width)),
        )
    )
    counters = keys.groupBy("_row", "_bucket").agg(F.sum("true_cnt").alias("_c"))
    return (
        keys.join(F.broadcast(counters), ["_row", "_bucket"])
        .groupBy(key_col, "true_cnt")
        .agg(F.min("_c").alias("cms_est"))
    )


def resample_interp(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Gap fill by LINEAR INTERPOLATION between the surrounding observed
    points — :func:`resample_ffill`'s twin for metrics that drift rather
    than step. Same distributed shape (bucket agg → sequence() grid →
    left join); the fill needs one backward and one forward
    ignore-nulls window pass per key instead of one. Because each key's
    grid spans exactly its observed [min, max] buckets, every gap is
    interior: the previous and next anchors always exist and the slope
    denominator is never zero.

    All values ride an integer ten-thousandths grid and every round is at
    scale 0: interpolation midpoints land exactly on .5 decimal
    boundaries, where fractional-scale ROUND implementations disagree
    across engines (BigDecimal half-up vs multiply-and-floor); scale-0
    rounding of identical IEEE doubles is the one portable form."""
    from pyspark.sql.window import Window

    bucket = F.date_trunc(unit, F.col(ts_col))
    pts = (
        df.groupBy(F.col(key_col), bucket.alias("bucket"))
        .agg(F.round(F.avg(value_col) * 10000, 0).alias("_vi"))
    )
    span = pts.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        key_col,
        F.explode(F.sequence("_b0", "_b1", F.expr(f"INTERVAL 1 {unit}"))).alias("bucket"),
    )
    j = grid.join(pts, [key_col, "bucket"], "left")
    wb = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_bucket = F.when(F.col("_vi").isNotNull(), F.col("bucket"))
    pv = F.last("_vi", ignorenulls=True).over(wb)
    pb = F.last(obs_bucket, ignorenulls=True).over(wb).cast("double")
    nv = F.first("_vi", ignorenulls=True).over(wf)
    nb = F.first(obs_bucket, ignorenulls=True).over(wf).cast("double")
    eb = F.col("bucket").cast("double")
    interp_i = F.round((pv * (nb - eb) + nv * (eb - pb)) / (nb - pb), 0)
    vi = F.when(F.col("_vi").isNotNull(), F.col("_vi")).otherwise(interp_i)
    return j.select(
        key_col,
        "bucket",
        (vi / 10000.0).alias("value_interp"),
        F.col("_vi").isNull().alias("is_gap"),
    ).orderBy(key_col, "bucket")
