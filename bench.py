"""Benchmark harness: wall-clock per registered query at $SPARK_GRAFT_SF_DIR.

Runs every ``__spark_entry__.queries()`` entry on
``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``), forces full execution
with a count-collect, and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Notes:
- A warm-up query runs first so JVM/codegen startup isn't billed to q1.
- Each query is timed end-to-end (plan + execute + fetch), matching how the
  serving layer would pay for it.
- ``SPARK_GRAFT_BENCH_REPEAT`` (default 2) re-runs each query and keeps the
  minimum: single-run timings on a shared box show multi-second GC/straggler
  spikes on random queries; min-of-2 reports the query's real cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

from kafkasparkstream_spark.session import get_spark

import __spark_entry__ as entrymod


def _force(df) -> int:
    """Execute the full plan and materialize results (what a consumer pays)."""
    return len(df.collect())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark(app_name="kafkasparkstream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()

    # Warm-up: touch every table once so first-timed query isn't billed for
    # JVM classloading / parquet footer reads, and spin up the Python UDF
    # worker pool so Arrow-kernel queries aren't billed for worker forks.
    from kafkasparkstream_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, t, sf_dir).count()
    spark.range(64, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        lambda it: it, "id long"
    ).count()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            n = _force(queries[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
