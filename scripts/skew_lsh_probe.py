"""Planted hot-bucket LSH probe (VERDICT r6 item 7): measure the all-pairs
candidate blow-up on a 1k-near-identical-clone clique and the star-cap fix,
and fold the numbers into SKEW_BENCH.json under "lsh_hot_bucket".

Run: python scripts/skew_lsh_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    from kafkasparkstream_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from kafkasparkstream_spark.session import get_spark

    spark = get_spark(app_name="lsh-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    clones, normals = 1000, 1000
    base = " ".join(f"tok{i}" for i in range(30))
    rows = [(i, base + f" uniq{i}") for i in range(clones)]
    rows += [
        (clones + i, " ".join(f"w{i}x{j}" for j in range(30)))
        for i in range(normals)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(32)
    df.count()

    t0 = time.perf_counter()
    full = minhash_lsh_pairs(df, max_bucket_size=None)
    n_full = full.count()
    t_full = time.perf_counter() - t0

    t0 = time.perf_counter()
    capped = minhash_lsh_pairs(df, max_bucket_size=50)
    n_capped = capped.count()
    t_capped = time.perf_counter() - t0

    t0 = time.perf_counter()
    cl_full = {
        (r["doc_id"], r["cluster_id"]) for r in connected_components(full).collect()
    }
    cl_capped = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(capped).collect()
    }
    t_cc = time.perf_counter() - t0

    rec = {
        "fixture": {
            "clones": clones,
            "normals": normals,
            "clique_pairs_possible": clones * (clones - 1) // 2,
        },
        "all_pairs": {"verified_pairs": n_full, "wall_sec": round(t_full, 2)},
        "star_cap_50": {
            "verified_pairs": n_capped,
            "wall_sec": round(t_capped, 2),
            "dropped_clique_edges": n_full - n_capped,
        },
        "cluster_parity": {
            "identical": cl_full == cl_capped,
            "compare_wall_sec": round(t_cc, 2),
        },
        "note": (
            "near-identical clones survive exact_dedup and collapse into one "
            "LSH bucket; all-pairs candidates are quadratic in clone count. "
            "max_bucket_size=50 emits star edges (min-id hub) in oversized "
            "buckets: candidates bounded by (n-1) per band, and "
            "connected-components clusters are IDENTICAL, so cluster-level "
            "dedup loses nothing; pair-level recall inside hot buckets is "
            "the documented trade."
        ),
    }
    path = os.path.join(HERE, "SKEW_BENCH.json")
    with open(path) as f:
        doc = json.load(f)
    doc["lsh_hot_bucket"] = rec
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
