"""Pin operator semantics that the full-table oracle can't distinguish.

Round-1 ADVICE found two latent divergences that the sf0.01 data never
exercises: multiset-vs-set EXCEPT, and z-score on degenerate (constant /
single-row) groups. These tests build the distinguishing inputs directly.
"""

from __future__ import annotations

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
