"""Physical-plan inspection — the engine's scale guardrails as a library.

`tests/test_plans.py` uses these to pin plan properties (pushdown,
broadcast choice, no cartesian products); they are equally useful
interactively: run ``plan_report(df)`` on any query before pointing it at
a 100 TB table and read off the scan/join/shuffle story.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (modes: simple, extended, codegen,
    cost, formatted)."""
    jvm_mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jvm_mode)


@dataclass
class PlanReport:
    """Scale-relevant facts extracted from a physical plan."""

    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffled_hash_joins: int = 0
    cartesian_products: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    @property
    def degenerate(self) -> bool:
        """True when the plan contains a join shape that will not survive
        scale (cartesian, or nested-loop without a deliberate tiny side)."""
        return self.cartesian_products > 0 or self.nested_loop_joins > 0


def plan_report(df: DataFrame) -> PlanReport:
    """Summarize the scale-relevant plan properties of a DataFrame."""
    simple = explain_str(df, "simple")
    formatted = explain_str(df, "formatted")
    r = PlanReport(
        broadcast_joins=simple.count("BroadcastHashJoin"),
        sortmerge_joins=simple.count("SortMergeJoin"),
        shuffled_hash_joins=simple.count("ShuffledHashJoin"),
        cartesian_products=simple.count("CartesianProduct"),
        nested_loop_joins=simple.count("BroadcastNestedLoopJoin"),
        exchanges=simple.count("Exchange"),
    )
    for line in formatted.splitlines():
        stripped = line.strip()
        if stripped.startswith("PushedFilters") and "[]" not in stripped:
            r.pushed_filters.append(stripped)
        elif stripped.startswith("PartitionFilters") and "[]" not in stripped:
            r.partition_filters.append(stripped)
        elif stripped.startswith("ReadSchema"):
            r.read_schemas.append(stripped)
    return r
