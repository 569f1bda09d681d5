"""Temporal operators Spark lacks as built-ins: as-of join, sessionization.

Both are single-shuffle compositions of DataFrame primitives — no Python in
the hot path, no range-explosion joins:

- **as-of join** — "attach the most recent right-side row at or before each
  left row's event time, per key". The classic implementations are a range
  join (quadratic blowup) or a per-key merge (imperative). The Spark-native
  shape used here: union both sides tagged, sort within each key partition
  by (ts, side), and carry the right side's values forward with
  ``last(..., ignoreNulls=True)`` over the preceding-rows frame. ONE shuffle
  on the key, linear work, and the sort is Tungsten's — this is the plan a
  1000-executor cluster wants (each key's timeline lands on one partition;
  skewed keys fall back to AQE skew handling).
- **sessionization** — gap-based session ids per key: ``lag`` to detect
  gaps, cumulative sum of gap flags to number sessions, then a grouped
  rollup. Same single shuffle on the key.

The DuckDB oracles check the as-of join against DuckDB's *native*
``ASOF JOIN`` operator — two independent implementations, one answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: tuple[str, ...],
    prefix: str = "prev_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` and the same key (inclusive as-of semantics).

    ``right`` must be unique per (key, ts) — pre-aggregate ties upstream
    (see ``asof_purchase_click`` for the ``max_by`` pattern); otherwise the
    "most recent" row is ambiguous in ANY engine.

    Returns every left column plus ``{prefix}{ts_col}`` and
    ``{prefix}{col}`` for each value col (null when no right row precedes).
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key_col, ts_col)],
    )
    tagged_l = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c) for c in lcols if c not in (key_col, ts_col)],
    )
    # Right rows sort before left rows at equal ts (side 0 < 1) → inclusive
    # `<=` semantics, matching ASOF JOIN's `l.ts >= r.ts`.
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{prefix}{ts_col}"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols, f"{prefix}{ts_col}", *[f"{prefix}{c}" for c in value_cols]
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the key's previous event exceeds ``gap_seconds``.

    Returns the input plus ``session_id`` (1-based per key, in time order).
    One shuffle on the key; both window passes reuse the same sort.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") > F.lit(gap_seconds))
    ).cast("int")
    return df.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ).drop("_new")


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum (exact cents —
    order-independent, identical in any engine)."""
    from kafkasparkstream_spark.operators.aggregates import value_units

    s = sessionize(df, key_col, ts_col, order_col, gap_seconds)
    return (
        s.groupBy(key_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(value_units(value_col)).cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy(key_col, "session_id")
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    window_seconds: int = 60,
    id_col: str = "event_id",
) -> DataFrame:
    """For each left row, count right rows with the same key whose time is
    in ``(left.ts - window_seconds, left.ts]`` — a range join.

    A naive inequality join degenerates to a per-key nested loop. The
    Spark-native shape: bin both sides into ``window_seconds`` buckets and
    equi-join on (key, bin), with each left row probing its own bin and the
    previous one (any right row in range lives in one of the two). The
    inequality becomes a post-join filter on an already-tiny candidate set,
    and the join is a plain hash join on well-distributed keys — this is the
    plan that survives 1000 executors.

    Returns every left row (count 0 when nothing in range).
    """
    bin_ = lambda c: F.floor(F.col(c).cast("long") / window_seconds)  # noqa: E731
    r = right.select(
        F.col(key_col), F.col(ts_col).alias("_r_ts"), bin_(ts_col).alias("_bin")
    )
    l_binned = left.withColumn("_bin0", bin_(ts_col)).withColumn(
        "_bin", F.explode(F.array(F.col("_bin0") - 1, F.col("_bin0")))
    )
    matched = (
        l_binned.join(r, [key_col, "_bin"])
        .filter(
            (F.col("_r_ts") > F.col(ts_col) - F.expr(f"INTERVAL {window_seconds} SECONDS"))
            & (F.col("_r_ts") <= F.col(ts_col))
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_in_range"))
    )
    return (
        left.join(matched, id_col, "left")
        .withColumn("n_in_range", F.coalesce("n_in_range", F.lit(0)))
        .orderBy(id_col)
    )


def time_weighted_avg(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-key time-weighted average: each reading holds its value until the
    next reading, so its weight is that interval's duration (the last
    reading of a key carries no weight — its holding interval is unknown).
    The hypertable time-series-rollup semantics: irregular sampling must
    not let burst periods dominate the mean.

    One shuffle on the key; the next-timestamp lookup is a `lead` in the
    same window pass.

    Portability grid: values ride an integer cents grid and the weighted
    sum is pure int64 arithmetic (cents × microseconds), summed exactly in
    any accumulation order on any engine; the single float division and the
    scale-0 round at the end are then bit-identical everywhere — the float
    SUM(value · dur) form flipped rounded rows against the oracle at 10×
    data. Magnitudes: |cents| ≤ ~10^5 and per-key span is bounded by the
    dataset's time range, so the int64 sum has ~10^18 of headroom.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc(tiebreak))
    us = F.unix_micros(F.col(ts_col))
    dur = F.lead(us, 1).over(w) - us
    vq = F.rint(F.col(value_col) * 100).cast("long")
    weighted = df.select(
        key, vq.alias("_vq"), dur.alias("_dur_us")
    ).filter(F.col("_dur_us").isNotNull())
    # A key whose readings all share one instant has zero total span — its
    # TWA is undefined (and a 0/0 under ANSI mode); exclude it, as the
    # oracle does with HAVING.
    return (
        weighted.groupBy(key)
        .agg(
            F.sum(F.col("_vq") * F.col("_dur_us")).alias("_sp"),
            F.sum(F.col("_dur_us")).alias("_sd"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .filter(F.col("_sd") > 0)  # before the divide: ANSI-safe
        .select(
            key,
            (
                F.round(
                    F.col("_sp").cast("double")
                    / F.col("_sd").cast("double")
                    / 100.0
                    * 10000,
                    0,
                )
                / 10000
                + 0.0  # canonicalize IEEE -0.0 across engines
            ).alias("twa_value"),
            "n_intervals",
            (F.round(F.col("_sd").cast("double") / 100.0, 0) / 10000).alias(
                "span_seconds"
            ),
        )
        .orderBy(key)
    )


def scd2_history(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) compaction: collapse each key's
    event stream into attribute-validity intervals — one row per *change*,
    with ``valid_from``/``valid_to`` bounds and an ``is_current`` flag on
    the open interval. The CDC→dimension-table transformation.

    Two window passes over one shuffle on the key: ``lag`` flags change
    rows, ``lead`` over the filtered change rows closes each interval.
    Everything is column arithmetic on exact types — no Python, no second
    shuffle.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc(tiebreak))
    changed = (
        df.select(key, ts_col, attr_col, tiebreak)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev")))
    )
    w2 = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc(tiebreak))
    return (
        changed.select(
            key,
            F.col(attr_col),
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy(key, "valid_from")
    )


def time_decay_weighted_avg(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    half_scale_hours: float = 1.0,
) -> DataFrame:
    """Recency-weighted mean per key: weight = 1 / (1 + age/scale), age
    anchored at the dataset's max timestamp — the "what's the signal NOW"
    aggregate for monitoring / feature stores, where old readings should
    fade rather than vote equally.

    A rational decay (not exp()) on exact int64-µs ages: every arithmetic
    step is a correctly-rounded IEEE double op, so any engine evaluating the
    same formula produces bit-identical weights — exp() would differ in the
    last ulp between libm implementations. The anchor is a 1-row max(ts)
    aggregate broadcast to the scan (same sanctioned BNLJ shape as
    recent_aggregates_24h); weighted sums then partial-aggregate map-side
    into one tiny exchange per key.
    """
    us = F.unix_micros(F.col(ts_col))
    anchor = df.agg(F.max(us).alias("_mx"))
    scale_us = half_scale_hours * 3_600_000_000.0
    w = 1.0 / (1.0 + (F.col("_mx") - us) / F.lit(scale_us))
    return (
        df.crossJoin(F.broadcast(anchor))
        .select(key, F.col(value_col).alias("_v"), w.alias("_w"))
        .groupBy(key)
        .agg(
            F.round(F.sum(F.col("_v") * F.col("_w")) / F.sum("_w"), 4).alias(
                "decayed_avg"
            ),
            F.round(F.sum("_w"), 4).alias("total_weight"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(key)
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix of per-key event sequences: for each
    (event_type → next event_type) step observed inside a key's timeline,
    the count and its share of all transitions out of the source type —
    the empirical Markov chain behind funnel/propensity analyses.

    Plan: ONE shuffle on the key for the lead() window (deterministic
    order: ts, then id tiebreak so equal timestamps can't flip pairs
    between engines), then a hash-agg on the ~|types|² pair space whose
    partials collapse map-side. The per-source normalization is a second
    window over that tiny aggregate, not the event stream.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    steps = (
        df.select(key_col, ts_col, tiebreak_col, F.col(type_col).alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    pair_counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    out_tot = Window.partitionBy("from_type")
    return pair_counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(out_tot), 4
        ).alias("transition_prob"),
    ).orderBy("from_type", "to_type")


def ordered_funnel(
    df: DataFrame,
    stages: tuple[str, ...] = ("signup", "click", "purchase"),
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel conversion: how many users performed stage 1, then
    stage 2 strictly after it, then stage 3 after that — the sequencing
    report a plain per-type count can't answer (a purchase BEFORE signup
    must not convert).

    Each stage's timestamp is the min event time of that type strictly
    after the previous stage's timestamp, computed as successive
    aggregate-windows over the SAME ``partitionBy(key)`` — Catalyst plans
    one exchange on the key and chains the Window operators on the sorted
    partitions, so the whole multi-stage funnel costs a single shuffle.
    The final stage counts collapse via one 1-row aggregate, unpivoted
    with ``stack`` to (stage, stage_name, n_users, conversion).
    """
    w = Window.partitionBy(key_col)
    out = df.select(key_col, ts_col, type_col)
    prev = None
    stage_cols = []
    for i, stage in enumerate(stages):
        hit = F.col(type_col) == stage
        if prev is not None:
            hit = hit & (F.col(ts_col) > prev)
        col_name = f"_t{i}"
        out = out.withColumn(col_name, F.min(F.when(hit, F.col(ts_col))).over(w))
        prev = F.col(col_name)
        stage_cols.append(col_name)
    per_user = out.groupBy(key_col).agg(
        *[F.max(c).alias(c) for c in stage_cols]
    )
    counts = per_user.agg(
        F.count(F.lit(1)).alias("_all"),
        *[
            F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)).alias(f"_c{i}")
            for i, c in enumerate(stage_cols)
        ],
    )
    stack_args = ", ".join(
        f"{i + 1}, '{stage}', _c{i}" for i, stage in enumerate(stages)
    )
    stages_df = counts.select(
        F.expr(
            f"stack({len(stages)}, {stack_args}) AS (stage, stage_name, n_users)"
        ),
        F.col("_c0").alias("_base"),
    )
    return stages_df.select(
        "stage",
        "stage_name",
        "n_users",
        # nullif: zero stage-1 users means conversion is undefined (NULL),
        # not an ANSI divide-by-zero failure.
        F.round(
            F.col("n_users") / F.nullif(F.col("_base"), F.lit(0)), 4
        ).alias("conversion"),
    ).orderBy("stage")


def user_gap_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Inter-event cadence per user: count, mean/median/p95 gap seconds and
    the burstiness ratio (mean/median — >1 means a few long silences among
    rapid bursts), the activity-rhythm report behind session-timeout and
    rate-limit tuning.

    One shuffle on the key for the ``lag`` window (deterministic ts+id
    order), then a keyed hash-agg to |users| rows. Exact per-user
    percentiles buffer one user's gaps on its reducer — bounded by that
    user's event count; ``approx_percentile`` is the documented swap if
    single keys reach millions of events.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gaps = (
        df.select(key_col, ts_col, tiebreak_col)
        .withColumn(
            "_gap",
            F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w),
        )
        .filter(F.col("_gap").isNotNull())
    )
    return (
        gaps.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("_gap"), 4).alias("mean_gap_s"),
            F.round(F.percentile("_gap", F.lit(0.5)), 4).alias("p50_gap_s"),
            F.round(F.percentile("_gap", F.lit(0.95)), 4).alias("p95_gap_s"),
            F.round(
                F.avg("_gap") / F.nullif(F.percentile("_gap", F.lit(0.5)), F.lit(0.0)),
                4,
            ).alias("burstiness"),
        )
        .orderBy(key_col)
    )


def point_in_time_features(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizons: tuple[int, ...] = (3600, 86400),
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Leakage-free trailing-window feature backfill: for each left row
    (a label event), count/sum right rows of the same key STRICTLY BEFORE
    the label's time within each trailing horizon — the point-in-time-correct
    join that keeps training features identical to what serving would have
    seen (no same-instant or future leakage).

    One pass computes every horizon: both sides bin by the LARGEST horizon
    (the bucketized equi-join shape of :func:`range_join_count` — no
    nested-loop range join), and the shorter horizons fall out as
    conditional aggregates over the same candidate set. At 100 TB this is
    one hash join on (key, bin) + one aggregate, regardless of how many
    horizons the feature spec lists.
    """
    w_max = max(horizons)
    bin_ = lambda c: F.floor(F.col(c).cast("long") / w_max)  # noqa: E731
    r = right.select(
        F.col(key_col),
        F.col(ts_col).alias("_r_ts"),
        F.col(value_col).alias("_r_val"),
        bin_(ts_col).alias("_bin"),
    )
    l_binned = left.withColumn("_bin0", bin_(ts_col)).withColumn(
        "_bin", F.explode(F.array(F.col("_bin0") - 1, F.col("_bin0")))
    )
    in_h = {
        h: (F.col("_r_ts") >= F.col(ts_col) - F.expr(f"INTERVAL {h} SECONDS"))
        for h in horizons
    }
    aggs = []
    for h in horizons:
        aggs.append(F.sum(in_h[h].cast("long")).alias(f"n_{h}s"))
        aggs.append(
            F.round(F.sum(F.when(in_h[h], F.col("_r_val")).otherwise(0.0)), 4).alias(
                f"sum_{h}s"
            )
        )
    matched = (
        l_binned.join(r, [key_col, "_bin"])
        .filter(F.col("_r_ts") < F.col(ts_col))  # strict: no same-instant leakage
        .groupBy(id_col)
        .agg(*aggs)
    )
    out_cols = [c for h in horizons for c in (f"n_{h}s", f"sum_{h}s")]
    res = left.join(matched, id_col, "left")
    for h in horizons:
        res = res.withColumn(f"n_{h}s", F.coalesce(f"n_{h}s", F.lit(0)))
        res = res.withColumn(f"sum_{h}s", F.coalesce(f"sum_{h}s", F.lit(0.0)))
    return res.select(id_col, key_col, ts_col, *out_cols).orderBy(id_col)


def bounded_ewma(
    df: DataFrame,
    key: str,
    value: str,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    alpha: float = 0.5,
    taps: int = 8,
) -> DataFrame:
    """Per-key exponentially-weighted moving average with a fixed tap depth:
    ewma_i = Σ_{k<taps} alpha^k·v_{i-k} / Σ_{k present} alpha^k, the lag
    expansion of the EWMA recursion truncated where the geometric tail
    becomes negligible (alpha=1/2, 8 taps → <0.4% of total weight). The
    per-row prefix renormalizes by the weights actually present, so early
    rows are unbiased. Adds an ``ewma`` column; one keyed WindowExec pass,
    constant work per row regardless of history length."""
    if not (0.0 < alpha < 1.0) or taps < 1:
        raise ValueError("need 0 < alpha < 1 and taps >= 1")
    w = Window.partitionBy(key).orderBy(*order_cols)
    num = F.col(value).cast("double")
    den = F.lit(1.0)
    for k in range(1, taps):
        lk = F.lag(value, k).over(w)
        wt = alpha ** k
        num = num + F.coalesce(lk * F.lit(wt), F.lit(0.0))
        den = den + F.when(lk.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
    return df.withColumn("ewma", num / den)


def debounce(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    gap_seconds: float = 5.0,
    tie_col: str = "event_id",
) -> DataFrame:
    """Telemetry debounce flag: within each key's (ts, tie) order, a row
    arriving ≤ ``gap_seconds`` after the PREVIOUS row (kept or not) is a
    bounce — double-click, retry, sensor chatter. Adds a boolean ``keep``
    column; one keyed WindowExec lag pass. Distinct from dedup (bounces
    are real distinct events arriving too fast) and from sessionization
    (keeps the first of a burst rather than grouping it)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tie_col)
    gap = F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
    return df.withColumn("keep", gap.isNull() | (gap > gap_seconds))
