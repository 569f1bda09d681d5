"""JSON ingest-parse operators (S6-S9, SURVEY.md §2.2).

The reference's parse chain (spark-processor/processor.py:72-76):
``CAST(value AS STRING)`` → ``from_json(schema)`` → struct flatten →
timestamp cast. All four steps are single Catalyst expressions — they stay
inside whole-stage codegen, no Python in the hot path. Malformed JSON yields
null fields (PERMISSIVE semantics; every schema field nullable), matching the
reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, TimestampType


def parse_json_events(
    df: DataFrame,
    schema: StructType,
    payload_col: str = "value",
    ts_col: str | None = "timestamp",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Kafka-payload parse chain (S6→S7→S8→S9, processor.py:72-76).

    ``df`` is any frame with a binary/string JSON column ``payload_col``
    (e.g. the raw Kafka source's ``value``). ``keep_cols`` optionally carries
    source metadata (topic/partition/offset) through the flatten.
    """
    parsed = df.select(
        *keep_cols,
        F.from_json(F.col(payload_col).cast("string"), schema).alias("data"),
    ).select(*keep_cols, "data.*")
    if ts_col is not None and ts_col in parsed.columns:
        parsed = parsed.withColumn(ts_col, F.col(ts_col).cast(TimestampType()))
    return parsed


def extract_props(
    df: DataFrame,
    schema: StructType,
    props_col: str = "props",
    prefix: str = "",
) -> DataFrame:
    """Parse an embedded JSON-string column (e.g. ``events.props``) into typed
    top-level columns, keeping every existing column."""
    parsed = df.withColumn("_props_struct", F.from_json(F.col(props_col), schema))
    for field in schema.fields:
        parsed = parsed.withColumn(
            f"{prefix}{field.name}", F.col(f"_props_struct.{field.name}")
        )
    return parsed.drop("_props_struct")
