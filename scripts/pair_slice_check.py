"""sf1.0 verification for the pair-emitting queries whose FULL oracles are
all-pairs-infeasible in DuckDB at 50k docs / 8k vectors (the 16 `skipped`
names in the sf1.0 row of CROSS_SCALE.json).

Two independent checks, per VERDICT r3 item 5:

1. **Sampled oracle** — build a deterministic modulus slice of the sf1.0
   replica corpus that PRESERVES its near-duplicate structure: documents
   where ``doc_id % 5000 < 400`` keeps the same 400 base docs across all 10
   replicas (intact 10-cliques with the real ``' replicaN'`` perturbations),
   embeddings where ``vec_id % 2000 < 1000`` keeps the same 1000 base
   vectors across all 4 replicas. At 4k docs / 4k vecs every quadratic
   oracle is feasible, so the driver-grade compare (tests/oracle.py) runs
   the full hash match on genuine sf1.0-shaped data. All non-sliced tables
   are symlinked from .scratch/sf1.0 so cross-table queries resolve.

2. **Partition-invariance at FULL sf1.0** — each of the 16 queries runs
   twice against the whole .scratch/sf1.0 corpus with
   ``spark.sql.shuffle.partitions`` 16 vs 64; the result multisets must be
   identical. The comparison is an ORDER-INDEPENDENT fingerprint computed
   IN Spark (count + bit_xor + wrapped sum of xxhash64 over rows
   canonicalized column-sorted with floats on the driver compare's 9dp
   grid) — pair results run to millions of rows at sf1.0 and must never be
   collect()ed (the first version of this script OOM'd a 1g driver JVM
   doing exactly that). This is the Spark-vs-Spark property check: a pair
   set that depends on partitioning (e.g. a per-partition top-k that isn't
   re-reduced, or rank ties cut non-deterministically) diverges here even
   though no oracle exists at this size.

Usage:
    python scripts/make_sf1.py          # once, builds .scratch/sf1.0
    python scripts/pair_slice_check.py  [--skip-invariance]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

SF1 = REPO / ".scratch" / "sf1.0"
SLICE = REPO / ".scratch" / "sf1.0_pairslice"

# The 16 sf1.0-skipped names: union of oracle_sweep's `quadratic` (11 doc-pair)
# and `quadratic_vecs` (6 embedding-pair; embedding_neardup is in both).
PAIR_QUERIES = sorted(
    {
        "dedup_containment",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash_pairs",
        "dedup_incremental",
        "dedup_clusters",
        "dedup_keep_best",
        "dedup_source_matrix",
        "embedding_neardup",
        "semdedup_clusters",
        "dedup_edit_distance_blocked",
        "hard_negatives_topk",
        "knn_graph",
        "knn_jaccard_links",
        "knn_triangle_stats",
        "pagerank_knn_graph",
    }
)

DOC_MOD, DOC_KEEP = 5000, 400  # 10 replicas x 400 base docs = 4000
VEC_MOD, VEC_KEEP = 2000, 1000  # 4 replicas x 1000 base vecs = 4000


def build_slice() -> None:
    import duckdb

    os.makedirs(SLICE, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SF1}/documents.parquet') "
        f"WHERE doc_id % {DOC_MOD} < {DOC_KEEP}) "
        f"TO '{SLICE}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SF1}/embeddings.parquet') "
        f"WHERE vec_id % {VEC_MOD} < {VEC_KEEP}) "
        f"TO '{SLICE}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        dst = SLICE / f"{t}.parquet"
        if not dst.exists():
            os.symlink(SF1 / f"{t}.parquet", dst)
    print(f"slice built at {SLICE}: 10x{DOC_KEEP} docs, 4x{VEC_KEEP} vecs")


def sampled_oracle(spark) -> list[tuple[str, str]]:
    from kafkasparkstream_spark.operators.dedup import deep_release

    import __spark_entry__ as E
    from oracle import assert_matches_oracle

    Q, O = E.queries(), E.oracle_sql()
    fails = []
    for name in PAIR_QUERIES:
        t0 = time.time()
        try:
            df = Q[name](spark, str(SLICE))
            if name in O:
                assert_matches_oracle(df, O[name], str(SLICE), name=name)
                print(f"PASS sampled-oracle {name} ({time.time() - t0:.1f}s)", flush=True)
            else:
                df.count()
                print(f"PASS rows-only {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            fails.append((name, repr(e)[:300]))
            print(f"FAIL sampled-oracle {name}: {repr(e)[:200]}", flush=True)
        deep_release(spark)
    return fails


def _fingerprint(df):
    """Order-independent multiset fingerprint, computed distributed: rows
    are canonicalized (columns sorted by name, floats rounded to the driver
    compare's 9dp grid), hashed with xxhash64, and reduced with
    (count, bit_xor, wrapped sum) — no fact-sized collect."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    cols = []
    for f in sorted(df.schema.fields, key=lambda f: f.name):
        c = F.col(f.name)
        if isinstance(f.dataType, (DoubleType, FloatType)):
            c = F.round(c, 9)
        cols.append(c.cast("string"))
    h = df.select(F.xxhash64(*cols).alias("h"))
    row = h.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(h)").alias("x"),
        F.sum(F.col("h") % F.lit(2_147_483_647)).alias("s"),
    ).collect()[0]
    return (row["n"], row["x"], row["s"])


def invariance_full_sf1(spark) -> list[tuple[str, str]]:
    from kafkasparkstream_spark.operators.dedup import deep_release

    import __spark_entry__ as E

    Q = E.queries()
    fails = []
    for name in PAIR_QUERIES:
        t0 = time.time()
        try:
            results = []
            for parts in ("16", "64"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                results.append(_fingerprint(Q[name](spark, str(SF1))))
                deep_release(spark)
            if results[0] != results[1]:
                fails.append(
                    (name, f"partition-dependent result: {results[0]} != {results[1]}")
                )
                print(f"FAIL invariance {name}: {results}", flush=True)
            else:
                print(
                    f"PASS invariance {name} ({time.time() - t0:.1f}s, "
                    f"{results[0][0]} rows)",
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001
            fails.append((name, repr(e)[:300]))
            print(f"FAIL invariance {name}: {repr(e)[:200]}", flush=True)
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-invariance", action="store_true")
    ap.add_argument("--skip-sampled", action="store_true")
    args = ap.parse_args()
    if not SF1.exists():
        print("run scripts/make_sf1.py first", file=sys.stderr)
        return 2
    build_slice()
    # ONE session for both phases, created BEFORE any phase runs:
    # spark.driver.memory only takes effect at JVM launch, so setting it in
    # a later getOrCreate() silently no-ops if an earlier phase already
    # built the session — the invariance pass would then run full-sf1.0
    # pair queries on a default 1g driver (which in local mode also hosts
    # the executors), the exact OOM class this harness exists to catch.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.sparkContext._conf.get("spark.driver.memory") == "8g", (
        "driver.memory not applied - a SparkSession already existed"
    )
    fails = []
    if not args.skip_sampled:
        fails += sampled_oracle(spark)
    if not args.skip_invariance:
        fails += invariance_full_sf1(spark)
    print(f"\n=== pair_slice_check: {len(fails)} failures")
    for name, err in fails:
        print("FAIL", name, err)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
