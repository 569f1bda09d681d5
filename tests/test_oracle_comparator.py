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
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(df, "SELECT CAST(2 AS BIGINT) AS n", SF)


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
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(df, "SELECT 1.000000002::DOUBLE AS x", SF)
    # identical doubles pass
    df2 = spark.createDataFrame([(0.1,)], "x double")
    assert_matches_oracle(df2, "SELECT 0.1::DOUBLE AS x", SF)
