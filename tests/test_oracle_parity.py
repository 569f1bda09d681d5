"""Every registered query hash-matches its DuckDB oracle (driver's t2 gate,
run locally at sf0.01 — same scale the driver uses)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT
from tests.oracle import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    if name not in ORACLES:
        # Non-SQL-expressible op: driver does a rows-only check.
        assert df.count() >= 0
        return
    assert_matches_oracle(df, ORACLES[name], SF_CORRECT, name=name)
