"""Table-level data-quality auditing — declarative constraint checks
(null-rate, uniqueness, domain membership, range, parseability) evaluated
in ONE scan, the production pre-flight every ingest pipeline runs before
publishing a table.

Every check is a conditional aggregate over the same pass (map-side
partials, 1-row exchange), then unpivoted to (check, n_violations, pass)
rows with ``stack`` — auditing 100 TB costs exactly one read no matter how
many constraints are declared. This is the deequ/great-expectations shape
re-expressed as pure Catalyst aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_not_null(col: str) -> tuple[str, Column]:
    return f"{col}_not_null", F.col(col).isNull()

def check_unique(col: str) -> tuple[str, Column]:
    """Uniqueness is the one check that can't ride a row predicate — it
    compares COUNT vs COUNT(DISTINCT) inside the same aggregate."""
    return f"{col}_unique", None  # sentinel; handled in audit()

def check_in_domain(col: str, values: tuple[str, ...]) -> tuple[str, Column]:
    return f"{col}_in_domain", ~F.col(col).isin(*values)

def check_range(col: str, lo, hi) -> tuple[str, Column]:
    return f"{col}_in_range", ~F.col(col).between(lo, hi)

def check_json_parseable(col: str, schema: str | None = None) -> tuple[str, Column]:
    """Flag non-null strings that are not valid JSON — the exact semantic
    of DuckDB's ``json_valid`` (objects, arrays, and scalars all count as
    valid), via ``try_parse_json``, which returns NULL for any
    unparseable input including empty/whitespace strings. Schema-directed
    ``from_json`` cannot express this on Spark 4: PERMISSIVE mode yields
    a struct of null fields for malformed OBJECTS (indistinguishable from
    valid JSON missing those fields) yet a null struct for blank input,
    and its corrupt-record column also fires on valid non-object JSON.
    ``schema`` is accepted for signature stability but unused — validity
    is schema-independent."""
    del schema  # validity is schema-independent; kept for call-site compat
    return (
        f"{col}_json_parseable",
        F.col(col).isNotNull() & F.try_parse_json(F.col(col)).isNull(),
    )


def audit(
    df: DataFrame,
    checks: list[tuple[str, Column | None]],
    unique_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Evaluate all checks in one aggregate; emit one row per check:
    (check, n_rows, n_violations, violation_ratio, passed)."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    names: list[str] = []
    for name, pred in checks:
        if pred is None:
            continue
        aggs.append(F.sum(pred.cast("long")).alias(f"_v_{name}"))
        names.append(name)
    for col in unique_cols:
        name = f"{col}_unique"
        aggs.append(
            (F.count(col) - F.countDistinct(col)).alias(f"_v_{name}")
        )
        names.append(name)
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', _v_{n}" for n in names)
    long = one.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) AS (check_name, n_violations)"
        ),
        F.col("_total").alias("n_rows"),
    )
    return long.select(
        "check_name",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") / F.nullif(F.col("n_rows"), F.lit(0)), 6).alias(
            "violation_ratio"
        ),
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")


def benford_first_digit(df, value_col: str = "value", group_col: str = "event_type"):
    """First-significant-digit distribution per group vs the Benford
    expectation log10(1 + 1/d) — the forensic screen for fabricated or
    unit-mangled numeric columns (organically-generated magnitudes follow
    Benford; uniform synthetics and copy-paste artifacts don't).

    One scan → one (group, digit) hash aggregate; the Benford reference is
    a closed-form literal, not a table. Reports the per-digit frequency gap
    vs Benford.
    """
    import math

    from pyspark.sql.window import Window

    digit = F.substring(
        F.regexp_replace(F.abs(F.col(value_col)).cast("string"), r"[0.]*", ""), 1, 1
    ).cast("int")
    d = df.filter(F.col(value_col).isNotNull() & (F.col(value_col) != 0)).select(
        F.col(group_col), digit.alias("_d")
    ).filter(F.col("_d").isNotNull() & (F.col("_d") > 0))
    counts = d.groupBy(group_col, "_d").agg(F.count(F.lit(1)).alias("_c"))
    totals = F.sum("_c").over(Window.partitionBy(group_col))
    expected = None
    for dig in range(1, 10):
        p = math.log10(1 + 1 / dig)
        expected = F.when(F.col("_d") == dig, F.lit(p)) if expected is None else expected.when(F.col("_d") == dig, F.lit(p))
    return (
        counts.withColumn("_tot", totals)
        .select(
            group_col,
            F.col("_d").alias("first_digit"),
            F.col("_c").alias("n"),
            F.round(F.col("_c") / F.col("_tot"), 4).alias("freq"),
            F.round(expected, 4).alias("benford_freq"),
            F.round(F.abs(F.col("_c") / F.col("_tot") - expected), 4).alias("abs_gap"),
        )
        .orderBy(group_col, "first_digit")
    )
