"""Direct unit tests for the governance and quality operators on crafted
micro-data — the oracle-parity suite proves them on the fixed corpus; these
pin edge cases the corpus never hits (duplicate tombstones, empty inputs,
all-null columns, violation boundary values)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafkasparkstream_spark.operators import governance as gov
from kafkasparkstream_spark.operators import quality as q


def test_purge_rows_and_report_with_duplicate_tombstones(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b")],
        "user_id long, event_type string",
    )
    # user 1 requested deletion twice; user 9 never existed
    tomb = spark.createDataFrame([(1,), (1,), (9,)], "user_id long")

    survived = gov.purge_rows(fact, tomb, "user_id")
    assert sorted((r["user_id"], r["event_type"]) for r in survived.collect()) == [
        (2, "a"), (3, "b"), (4, "b"),
    ]

    rep = {r["event_type"]: r for r in gov.purge_report(fact, tomb).collect()}
    assert rep["a"]["n_purged"] == 2 and rep["a"]["n_kept"] == 1
    assert rep["a"]["n_keys_purged"] == 1, "duplicate tombstones must not double-count"
    assert rep["b"]["n_purged"] == 0 and rep["b"]["n_kept"] == 2
    assert rep["b"]["n_keys_purged"] == 0


def test_purge_of_everything_and_of_nothing(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "a")], "user_id long, event_type string")
    none = gov.purge_rows(fact, spark.createDataFrame([], "user_id long"), "user_id")
    assert none.count() == 2
    all_ = gov.purge_rows(fact, fact.select("user_id"), "user_id")
    assert all_.count() == 0


def test_quality_audit_exact_violation_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "click", 5.0, '{"a": 1}'),
            (2, None, -1.0, "not json"),
            (2, "zzz", 1000.0, None),
            (3, "view", 50.0, '{"a": 2}'),
            (4, "view", 50.0, ""),        # blank: invalid JSON (json_valid semantics)
            (5, "view", 50.0, "[1, 2]"),  # valid non-object JSON: NOT a violation
            (6, "view", 50.0, "123"),     # valid scalar JSON: NOT a violation
        ],
        "event_id long, event_type string, value double, props string",
    )
    rep = {
        r["check_name"]: r
        for r in q.audit(
            df,
            checks=[
                q.check_not_null("event_type"),
                q.check_in_domain("event_type", ("click", "view")),
                q.check_range("value", 0.0, 100.0),
                q.check_json_parseable("props", "a INT"),
            ],
            unique_cols=("event_id",),
        ).collect()
    }
    assert rep["event_type_not_null"]["n_violations"] == 1
    # null is NOT a domain violation (not-null is its own check)
    assert rep["event_type_in_domain"]["n_violations"] == 1
    assert rep["value_in_range"]["n_violations"] == 2  # -1 and 1000
    # json_valid semantics: 'not json' and '' are violations; null is
    # skipped; arrays and scalars are VALID JSON (matching the oracle)
    assert rep["props_json_parseable"]["n_violations"] == 2
    assert rep["event_id_unique"]["n_violations"] == 1  # id 2 twice
    assert all(r["n_rows"] == 7 for r in rep.values())
    assert not rep["value_in_range"]["passed"]


def test_quality_audit_on_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    rep = q.audit(df, checks=[q.check_not_null("x")], unique_cols=("x",)).collect()
    by = {r["check_name"]: r for r in rep}
    assert by["x_not_null"]["n_violations"] == 2
    # count(col) ignores nulls → zero non-null rows, zero duplicates
    assert by["x_unique"]["n_violations"] == 0


def test_operator_parameter_guards():
    """Misconfigured operators must fail at build time with clear errors,
    not produce silently wrong plans."""
    import pytest as _pytest

    from kafkasparkstream_spark.operators.analytics import skyline_2d
    from kafkasparkstream_spark.operators.temporal import bounded_ewma
    from kafkasparkstream_spark.functions.hashing import md5_int

    with _pytest.raises(ValueError, match="bucket_width"):
        skyline_2d(None, x="x", y="y", bucket_width=0)
    with _pytest.raises(ValueError, match="alpha"):
        bounded_ewma(None, key="k", value="v", alpha=1.0)
    with _pytest.raises(ValueError, match="taps"):
        bounded_ewma(None, key="k", value="v", taps=0)
    with _pytest.raises(ValueError, match="hex_chars"):
        md5_int(None, hex_chars=16)
    from kafkasparkstream_spark.operators.text import bm25_scores

    with _pytest.raises(ValueError, match="query_terms"):
        bm25_scores(None, query_terms=())
