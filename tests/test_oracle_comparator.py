"""Self-test of the DuckDB-oracle comparator: a gate that cannot fail is
no gate. Plants value, row-count, column-name, and float-grid mismatches
and expects each to raise; confirms genuinely equal results (including
permuted columns and rows) pass."""

from __future__ import annotations

import pytest

from oracle import assert_matches_oracle

SF = "/root/testdata/sf0.01"


def test_comparator_passes_on_equal_modulo_order(spark):
    df = spark.createDataFrame([(2, "b"), (1, "a")], "n long, s string")
    # different row order AND different column order in the SQL
    assert_matches_oracle(df, "SELECT 'a' AS s, CAST(1 AS BIGINT) AS n UNION ALL SELECT 'b', 2", SF)


def test_comparator_raises_on_value_mismatch(spark):
    df = spark.createDataFrame([(1,)], "n long")
    with pytest.raises(AssertionError, match="value/type mismatch"):
        assert_matches_oracle(df, "SELECT CAST(2 AS BIGINT) AS n", SF)


def test_comparator_is_result_type_sensitive(spark):
    """r04 regression: the driver hash distinguishes result TYPES that
    Python-value fetches erase. A DuckDB SUM(int) (HUGEINT) against an
    equal Spark BIGINT must fail here like it failed the driver; so must
    a DECIMAL against a double."""
    df = spark.createDataFrame([(3,)], "n long")
    # equal values, but the bare SUM widens to HUGEINT on the oracle side
    with pytest.raises(AssertionError, match="value/type mismatch"):
        assert_matches_oracle(
            df, "SELECT SUM(x) AS n FROM (VALUES (1), (2)) t(x)", SF
        )
    # and the BIGINT-cast twin passes
    assert_matches_oracle(
        df, "SELECT CAST(SUM(x) AS BIGINT) AS n FROM (VALUES (1), (2)) t(x)", SF
    )
    df2 = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(AssertionError, match="value/type mismatch"):
        assert_matches_oracle(df2, "SELECT CAST(1.5 AS DECIMAL(18,2)) AS x", SF)


def test_comparator_raises_on_row_count_mismatch(spark):
    df = spark.createDataFrame([(1,), (1,)], "n long")
    with pytest.raises(AssertionError, match="row count"):
        assert_matches_oracle(df, "SELECT CAST(1 AS BIGINT) AS n", SF)


def test_comparator_raises_on_column_name_mismatch(spark):
    df = spark.createDataFrame([(1,)], "n long")
    with pytest.raises(AssertionError, match="column names"):
        assert_matches_oracle(df, "SELECT CAST(1 AS BIGINT) AS m", SF)


def test_comparator_float_grid_is_strict(spark):
    # differs at the 9th decimal — must FAIL (the grid is the contract)
    df = spark.createDataFrame([(1.000000001,)], "x double")
    with pytest.raises(AssertionError, match="value/type mismatch"):
        assert_matches_oracle(df, "SELECT 1.000000002::DOUBLE AS x", SF)
    # identical doubles pass
    df2 = spark.createDataFrame([(0.1,)], "x double")
    assert_matches_oracle(df2, "SELECT 0.1::DOUBLE AS x", SF)


def test_comparator_strict_floats_mode_is_bit_exact(spark):
    """--strict-floats audit mode: doubles differing below the 9dp grid
    (here 1 ulp) pass the normal compare but FAIL strict — the knob that
    makes ROUND-half-tie divergence visible."""
    import math

    import oracle as oracle_mod

    ulp_off = math.nextafter(0.25, 1.0)
    df = spark.createDataFrame([(ulp_off,)], "x double")
    assert_matches_oracle(df, "SELECT 0.25::DOUBLE AS x", SF)  # grid: passes
    oracle_mod.STRICT_FLOATS = True
    try:
        with pytest.raises(AssertionError, match="value/type mismatch"):
            assert_matches_oracle(df, "SELECT 0.25::DOUBLE AS x", SF)
        # bit-identical still passes in strict mode
        df2 = spark.createDataFrame([(0.25,)], "x double")
        assert_matches_oracle(df2, "SELECT 0.25::DOUBLE AS x", SF)
    finally:
        oracle_mod.STRICT_FLOATS = False
