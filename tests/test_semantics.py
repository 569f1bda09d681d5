"""Pin operator semantics that the full-table oracle can't distinguish.

Round-1 ADVICE found two latent divergences that the sf0.01 data never
exercises: multiset-vs-set EXCEPT, and z-score on degenerate (constant /
single-row) groups. These tests build the distinguishing inputs directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkasparkstream_spark.operators import windows as win_ops


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, value double"
    )


def test_except_is_set_semantics_not_multiset(spark):
    # u1 has MORE signups than purchases — multiset EXCEPT ALL would keep it;
    # set EXCEPT must drop it because one purchase exists.
    df = _events(
        spark,
        [
            (1, "u1", "signup", 1.0),
            (2, "u1", "signup", 1.0),
            (3, "u1", "purchase", 1.0),
            (4, "u2", "signup", 1.0),
            (5, "u3", "purchase", 1.0),
        ],
    )
    out = [r.user_id for r in win_ops.event_type_user_except(df, "signup", "purchase").collect()]
    assert out == ["u2"]


def test_zscore_grouped_map_null_on_degenerate_groups(spark):
    df = _events(
        spark,
        [
            (1, "u1", "const", 5.0),   # constant-valued group: sd == 0
            (2, "u1", "const", 5.0),
            (3, "u1", "single", 7.0),  # single-row group: sd is NaN
            (4, "u1", "vary", 1.0),
            (5, "u1", "vary", 3.0),
        ],
    )
    rows = {
        r.event_id: r.zscore
        for r in win_ops.zscore_per_key(df, key_col="event_type").collect()
    }
    assert rows[1] is None and rows[2] is None, "constant group must yield NULL"
    assert rows[3] is None, "single-row group must yield NULL"
    assert rows[4] is not None and rows[5] is not None

    # and the window-function twin agrees on the same input
    win_rows = {
        r.event_id: r.zscore
        for r in win_ops.zscore_per_key_window(df, key_col="event_type").collect()
    }
    assert win_rows == rows


def test_hll_sketch_merge_equals_direct(spark):
    """Incremental distinct maintenance: unioning per-batch HLL sketches
    must give the SAME estimate as sketching all data in one pass (sketch
    merge is lossless w.r.t. the sketch state), and land within the
    configured error of the exact count."""
    from kafkasparkstream_spark.operators.aggregates import (
        distinct_sketch_partials,
        merge_distinct_sketches,
    )
    from kafkasparkstream_spark.tables import load_table

    events = load_table(spark, "events", "/root/testdata/sf0.01")
    b1 = events.filter(F.col("event_id") % 2 == 0)
    b2 = events.filter(F.col("event_id") % 2 == 1)

    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct_sketches(
            distinct_sketch_partials(b1), distinct_sketch_partials(b2)
        ).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct_sketches(distinct_sketch_partials(events)).collect()
    }
    assert merged == direct, "sketch union must be order/partition lossless"

    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, est in merged.items():
        assert abs(est - exact[et]) / exact[et] < 0.05, (et, est, exact[et])


def test_schema_diff_classifies_drift(spark):
    from kafkasparkstream_spark.tables import schema_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "id long, name string, v double")
    new = spark.createDataFrame([(1, "a", 2)], "id long, name string, v int").withColumn(
        "extra", F.lit("x")
    )
    d = {r["column"]: r for r in schema_diff(old, new)}
    assert d["extra"]["change"] == "added" and d["extra"]["new"] == "string"
    assert d["v"]["change"] == "changed" and d["v"]["old"].startswith("double")
    assert "id" not in d and "name" not in d
    removed = {r["column"]: r for r in schema_diff(new, old)}
    assert removed["extra"]["change"] == "removed"


def test_rolling_sketch_tracks_exact_curve(spark):
    """The sketch-based trailing-7d active-user curve must stay within the
    HLL error band of the exact explode-based curve, day by day."""
    from kafkasparkstream_spark.operators.aggregates import (
        rolling_active_users,
        rolling_active_users_sketch,
    )
    from kafkasparkstream_spark.tables import load_table

    events = load_table(spark, "events", "/root/testdata/sf0.01")
    exact = {
        r["report_day"]: r["active_7d"] for r in rolling_active_users(events).collect()
    }
    approx = {
        r["report_day"]: r["approx_active_7d"]
        for r in rolling_active_users_sketch(events).collect()
    }
    assert set(approx) == set(exact)
    for day, est in approx.items():
        assert abs(est - exact[day]) / exact[day] < 0.05, (day, est, exact[day])


def test_pca_spectrum_matches_numpy_reference(spark):
    """Distributed Gram-partial PCA == single-machine numpy PCA on the same
    data (exact same math, merge order only shifts last-ulp)."""
    import duckdb
    import numpy as np

    from kafkasparkstream_spark.operators.similarity import pca_variance_spectrum
    from kafkasparkstream_spark.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.01")
    got = {r["component"]: r for r in pca_variance_spectrum(emb).collect()}

    raw = duckdb.sql(
        "SELECT embedding FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    ).fetchall()
    x = np.array([np.asarray(r[0], dtype=np.float64) for r in raw])
    cov = np.cov(x, rowvar=False)
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = evals.sum()
    for i, r in got.items():
        assert abs(r["eigenvalue"] - evals[i - 1]) < 1e-4, (i, r, evals[i - 1])
        assert abs(r["var_share"] - evals[i - 1] / total) < 1e-3
    assert got[len(got)]["cum_share"] <= 1.0


def test_countmin_overestimates_and_bounds(spark):
    """Count-min guarantee: estimate >= true count for every key, and the
    sketch state is (depth × width) counters regardless of cardinality."""
    from kafkasparkstream_spark.operators.aggregates import countmin_estimates
    from kafkasparkstream_spark.tables import load_table

    events = load_table(spark, "events", "/root/testdata/sf0.001")
    out = countmin_estimates(events, "user_id", depth=4, width=32).collect()
    assert len(out) > 0
    for r in out:
        assert r["cms_est"] >= r["true_cnt"], r


def test_udtf_chunker_matches_closed_form(spark):
    """Spark 4 Python UDTF surface: a row-expanding table function must
    reproduce text.chunk_documents' closed-form plan exactly. The UDTF is
    the escape hatch for 1→N logic a sequence/posexplode can't express;
    this pins that the API works AND that the closed-form operator is the
    equivalent (and shuffle-free, hence preferred) implementation."""
    from pyspark.sql.functions import udtf
    from pyspark.sql import functions as F

    from kafkasparkstream_spark.operators.text import chunk_documents
    from kafkasparkstream_spark.tables import load_table

    SIZE, STRIDE = 64, 48

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk_start int, chunk_len int, n_tokens int")
    class Chunk:
        def eval(self, doc_id: int, text: str):
            toks = text.strip().split()
            n = len(toks)
            start, idx = 0, 0
            while True:
                yield (doc_id, idx, start, min(SIZE, n - start), n)
                if start + SIZE >= n:
                    break
                start += STRIDE
                idx += 1

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").select("doc_id", "text")
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("chunk_udtf", Chunk)
    got = spark.sql(
        "SELECT c.* FROM _udtf_docs d, LATERAL chunk_udtf(d.doc_id, d.text) c"
    ).orderBy("doc_id", "chunk_idx")
    want = chunk_documents(docs, size=SIZE, stride=STRIDE).select(
        "doc_id", "chunk_idx", "chunk_start", "chunk_len",
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_observation_metrics_without_extra_job(spark):
    """Spark's Observation API: pipeline health metrics (row count, null
    count, sum) ride the SAME action as the query — no second scan. The
    at-scale use is per-batch data-quality counters on a 100 TB write
    without doubling the read."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from kafkasparkstream_spark.tables import load_table

    events = load_table(spark, "events", "/root/testdata/sf0.001")
    obs = Observation("ingest_health")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    written = observed.filter(F.col("event_type") != "nonexistent").count()
    m = obs.get
    assert m["n_rows"] == 1000 == written
    assert m["n_null_value"] == 0
    assert m["sum_value"] > 0


def test_triangle_stats_known_graphs(spark):
    """Triangle census on known graphs: K4 has 4 triangles, 12 wedges,
    clustering 1.0; a 4-path has none. Edge direction and duplicates must
    not matter (canonicalized internally)."""
    from kafkasparkstream_spark.operators.graph import triangle_stats

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b],  # both directions
        "src long, dst long",
    )
    r = triangle_stats(k4).first()
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (4, 6, 4, 12)
    assert abs(r.clustering_coeff - 1.0) < 1e-9

    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    r2 = triangle_stats(path).first()
    assert r2.n_triangles == 0 and r2.n_wedges == 2


def test_pit_features_never_leak_future(spark):
    """Point-in-time contract: right-side rows at or after the label's
    timestamp must not contribute — shifting every click to the label
    instant or later zeroes all features."""
    from kafkasparkstream_spark.operators.temporal import point_in_time_features

    labels = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # one click exactly at the label instant, one after: both must be ignored
    clicks = spark.createDataFrame(
        [(100, "2024-01-01 10:00:00", 5.0), (100, "2024-01-01 10:20:00", 7.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = point_in_time_features(labels, clicks, horizons=(3600,)).first()
    assert r["n_3600s"] == 0 and r["sum_3600s"] == 0.0
    # a click strictly before counts
    clicks2 = spark.createDataFrame(
        [(100, "2024-01-01 09:59:59", 5.0)], "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r2 = point_in_time_features(labels, clicks2, horizons=(3600,)).first()
    assert r2["n_3600s"] == 1 and abs(r2["sum_3600s"] - 5.0) < 1e-9


def test_ks_drift_bounds_and_identity(spark):
    """KS statistic properties: D ∈ [0,1]; splitting identical values into
    two equal halves gives D = 0; disjoint supports give D = 1."""
    from kafkasparkstream_spark.operators.windows import ks_two_sample_drift

    same = spark.createDataFrame(
        [(i, "k", 1.0) for i in range(10)], "event_id long, event_type string, value double"
    )
    r = ks_two_sample_drift(same).first()
    assert r.ks_stat == 0.0
    disjoint = spark.createDataFrame(
        [(i, "k", float(i % 2) * 100.0 + 1.0) for i in range(10)],
        "event_id long, event_type string, value double",
    )
    # odd ids -> sample 1 -> values 101.0; even -> 1.0: disjoint supports
    r2 = ks_two_sample_drift(disjoint).first()
    assert r2.ks_stat == 1.0


def test_builtin_approx_aggs_within_tolerance(spark):
    """Since round 7 the sketch queries are hash-gated: they emit exact
    values plus bounded verdicts computed in-query. Pin (a) every verdict
    is True on real data, (b) the gated exact sides agree with independent
    recomputation, and (c) the RAW sketch operators still land inside
    their documented error bands (the gate's booleans must never be
    certifying a vacuous bound)."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from kafkasparkstream_spark.operators import windows as win_ops

    sf = "/root/testdata/sf0.01"
    events = spark.read.parquet(f"{sf}/events.parquet")

    pct = E.queries()["approx_value_percentiles"](spark, sf).collect()
    assert pct and all(r["p50_in_band"] and r["p95_in_band"] for r in pct)
    # exact order-stat side vs interpolated percentile: within one cent + interp gap
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for r in pct:
        e = exact[r["event_type"]]
        assert abs(r["p50_cents"] / 100.0 - e["p50"]) <= max(1.0, 0.02 * e["p50"])
        assert abs(r["p95_cents"] / 100.0 - e["p95"]) <= max(1.0, 0.02 * e["p95"])

    got = E.queries()["approx_distinct_user_count"](spark, sf).collect()
    exact_n = events.select("user_id").distinct().count()
    assert got[0]["exact_distinct_users"] == exact_n
    assert got[0]["within_3rsd"] is True
    raw = win_ops.approx_distinct_user_count(events).first()["approx_distinct_users"]
    assert abs(raw - exact_n) <= 0.1 * exact_n


def test_md5_int_matches_duckdb_twin(spark):
    """The documented SQL twin of md5_int must reproduce the Spark values
    bit-for-bit — on ints, strings, unicode, the empty string, and salted
    variants. Every dedup/sampling oracle leans on this contract."""
    import duckdb

    from pyspark.sql import functions as F

    from kafkasparkstream_spark.functions.hashing import md5_int

    vals = ["", "a", "hello world", "naïve café ☕", "0", "12345", "sensor_7"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: (r["h8"], r["h15"], r["salted"])
        for r in df.select(
            "s",
            md5_int(F.col("s")).alias("h8"),
            md5_int(F.col("s"), hex_chars=15).alias("h15"),
            md5_int(F.col("s"), salt="tag_").alias("salted"),
        ).collect()
    }
    con = duckdb.connect()
    for v in vals:
        h8, h15, salted = con.execute(
            """
            SELECT CAST(('0x' || substr(md5(?), 1, 8)) AS BIGINT),
                   CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT),
                   CAST(('0x' || substr(md5('tag_' || ?), 1, 8)) AS BIGINT)
            """,
            [v, v, v],
        ).fetchone()
        assert got[v] == (h8, h15, salted), (v, got[v], (h8, h15, salted))


def test_salted_skew_join_matches_plain_join(spark):
    """Salt-and-replicate join must be row-for-row identical to the plain
    equi-join (inner and left), including duplicate fact rows on the hot
    key; every fact row carries exactly one salt, every dim row exists in
    every bucket, so each matched pair appears exactly once."""
    from kafkasparkstream_spark.operators.aggregates import salted_skew_join

    fact = spark.createDataFrame(
        [(i, 0 if i % 2 == 0 else i % 5, float(i)) for i in range(200)]
        + [(1000, 99, 1.0)],  # key with no dim match (left-join case)
        ["row_id", "k", "v"],
    )
    dim = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "name"]
    )
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, fact.join(dim, "k", how).select("row_id", "k", "v", "name").collect())
        )
        salted = sorted(
            map(
                tuple,
                salted_skew_join(fact, dim, "k", salt_col="row_id", how=how)
                .select("row_id", "k", "v", "name")
                .collect(),
            )
        )
        assert salted == plain, how
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_skew_join(fact, dim, "k", salt_col="row_id", buckets=1)


def test_distributed_ntile_matches_window_ntile(spark):
    """The distributed exact-ntile path (forced via distributed_threshold=0)
    must reproduce the single-partition F.ntile plan row-for-row, including
    uneven buckets (N % n != 0), duplicate values (tiebreak order), and
    fewer-rows-than-tiles inputs."""
    import kafkasparkstream_spark.operators.windows as win_ops

    for n_rows in (3, 7, 95, 1000):
        df = spark.range(n_rows).select(
            F.col("id").alias("event_id"),
            # duplicate-heavy values exercise the tiebreak
            ((F.col("id") * 37) % 11).cast("double").alias("value"),
        )
        dist = sorted(
            map(
                tuple,
                win_ops.ntile_decile_stats(df, distributed_threshold=0).collect(),
            )
        )
        plain = sorted(
            map(
                tuple,
                win_ops.ntile_decile_stats(
                    df, distributed_threshold=10**9
                ).collect(),
            )
        )
        assert dist == plain, n_rows


def test_semdedup_keeps_lowest_id_and_counts_copies(spark):
    """SemDeDup on a corpus of two well-separated clusters of IDENTICAL
    vectors: every copy after the lowest-id row in a cluster is a
    duplicate, the lowest-id row never is, and raising tau above 1.0
    (cosine's max) turns off dedup entirely."""
    from kafkasparkstream_spark.operators.similarity import semdedup_stats

    # Alternating so the k=2 init (vec_ids 0 and 1) seeds one centroid per
    # group: evens are [1,0], odds are [0,1].
    rows = [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0], i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    stats = {
        r["cluster_id"]: r
        for r in semdedup_stats(df, k=2, iters=1, tau=0.99).collect()
    }
    assert stats[0]["n_members"] == 5 and stats[0]["n_dups"] == 4
    assert stats[0]["n_kept"] == 1 and stats[0]["dup_rate"] == 0.8
    assert stats[1]["n_members"] == 5 and stats[1]["n_dups"] == 4

    off = semdedup_stats(df, k=2, iters=1, tau=1.01).collect()
    assert all(r["n_dups"] == 0 and r["n_kept"] == r["n_members"] for r in off)


def test_split_leakage_shuffle_mode_matches_broadcast_mode(spark):
    """broadcast_test=False (the proportional-split scale path: shuffle
    joins on the shingle key) must produce exactly the broadcast plan's
    rows."""
    from kafkasparkstream_spark.operators.text import split_leakage_overlap
    from kafkasparkstream_spark.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.01")
    bc = sorted(map(tuple, split_leakage_overlap(docs, broadcast_test=True).collect()))
    sh = sorted(map(tuple, split_leakage_overlap(docs, broadcast_test=False).collect()))
    assert bc == sh and len(bc) > 0


def test_extreme_events_guard_nulls_pass_through_and_oob_raises(spark, monkeypatch):
    """The composite-ordinal bounds guard must behave like the unguarded
    DuckDB oracle on NULLs — a NULL value/event_id yields a NULL ordinal
    that max_by/min_by skip (arg_max semantics), NOT a raise_error crash —
    while a row definitively outside the int64-safe bounds still fails
    loudly in-plan instead of silently wrapping."""
    import datetime

    import pytest
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from kafkasparkstream_spark import queries as Q

    ts = datetime.datetime(2024, 1, 1)

    import sys

    # Patch load_table in the module that DEFINES the query — since the r8
    # family split, each queries/ submodule holds its own binding.
    qmod = sys.modules[Q.QUERIES["extreme_events_by_type"].__module__]

    def fake_events(rows):
        df = spark.createDataFrame(
            [
                Row(
                    event_id=eid,
                    user_id=7,
                    event_type="click",
                    value=val,
                    ts=ts,
                    props="{}",
                )
                for eid, val in rows
            ]
        )
        monkeypatch.setattr(qmod, "load_table", lambda _s, _t, _d: df)
        return df

    # NULL value row present: query must still answer, picking the max/min
    # among non-NULL ordinals (event 2 peaks, event 1 troughs).
    fake_events([(1, 1.0), (2, 5.0), (3, None)])
    out = Q.extreme_events_by_type(spark, "ignored").collect()
    assert len(out) == 1
    assert out[0]["peak_event_id"] == 2 and out[0]["trough_event_id"] == 1

    # Definitively out-of-bounds value: loud in-plan failure, not a wrap.
    fake_events([(1, 1.0), (2, 1e9)])
    with pytest.raises(Exception, match="out of bounds"):
        Q.extreme_events_by_type(spark, "ignored").collect()
