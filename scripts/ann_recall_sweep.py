"""Recall-vs-parameter curves for the approximate ANN operators.

Measures recall@10 against the exact cosine top-10 while sweeping each
index's tuning knob — LSH bucket bits (with and without Hamming-1
multi-probe), IVF nprobe — at sf0.1. The artifact (ANN_RECALL.json) is the
tuning table an ANN deployment reads before picking an operating point:
recall rises with probes and falls with bits, and the measured curve makes
the trade concrete instead of asserted.

Usage:  python scripts/ann_recall_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def _recall(exact_pairs: set, appx_rows) -> float:
    appx = {(r["query_id"], r["neighbor_id"]) for r in appx_rows}
    return round(len(exact_pairs & appx) / len(exact_pairs), 4)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from kafkasparkstream_spark.operators import similarity
    from kafkasparkstream_spark.session import get_spark
    from kafkasparkstream_spark.tables import load_table

    spark = get_spark(app_name="ann-recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "embeddings", sf_dir)

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb).collect()
    }
    out: dict = {"sf_dir": sf_dir, "k": 10, "n_queries": 10, "curves": {}}

    lsh, mp = {}, {}
    for bits in (2, 3, 4, 5, 6):
        lsh[bits] = _recall(exact, similarity.lsh_bucketed_topk(emb, bits=bits).collect())
        mp[bits] = _recall(exact, similarity.lsh_multiprobe_topk(emb, bits=bits).collect())
        print(f"bits={bits}: lsh={lsh[bits]} multiprobe={mp[bits]}", flush=True)
    out["curves"]["lsh_bits"] = lsh
    out["curves"]["lsh_multiprobe_bits"] = mp

    ivf = {}
    for nprobe in (1, 2, 4, 8):
        ivf[nprobe] = _recall(exact, similarity.ivf_topk(emb, nprobe=nprobe).collect())
        print(f"nprobe={nprobe}: ivf={ivf[nprobe]}", flush=True)
    out["curves"]["ivf_nprobe"] = ivf

    ivfpq = {}
    for nprobe in (1, 2, 4):
        ivfpq[nprobe] = _recall(
            exact, similarity.ivfpq_topk(emb, nprobe=nprobe).collect()
        )
        print(f"nprobe={nprobe}: ivfpq={ivfpq[nprobe]}", flush=True)
    out["curves"]["ivfpq_nprobe"] = ivfpq

    rerank = {}
    for shortlist in (20, 50, 100, 200, 400):
        rerank[shortlist] = _recall(
            exact, similarity.ivfpq_rerank_topk(emb, shortlist=shortlist).collect()
        )
        print(f"shortlist={shortlist}: ivfpq_rerank={rerank[shortlist]}", flush=True)
    out["curves"]["ivfpq_rerank_shortlist"] = rerank

    # The registered adaptive operating point (r8 verdict #2): depth =
    # max(50, ceil(n/20)) — record its depth and recall per SF so the
    # cross-decade recall floor is a versioned artifact, not a claim.
    n_vecs = emb.count()
    depth = similarity.adaptive_shortlist_depth(n_vecs)
    adaptive = _recall(
        exact, similarity.ivfpq_rerank_topk(emb, shortlist=depth).collect()
    )
    out["ivfpq_rerank_adaptive"] = {
        "n_vecs": n_vecs, "depth": depth, "recall": adaptive,
    }
    print(f"adaptive depth={depth} (n={n_vecs}): ivfpq_rerank={adaptive}", flush=True)

    # Merge per-SF so cross-scale curves accumulate (VERDICT r7 item 7):
    # top-level keys reflect the latest run, "by_sf" keeps every SF.
    path = _ROOT / "ANN_RECALL.json"
    doc = {"by_sf": {}}
    try:
        with open(path) as f:
            prev = json.load(f)
        doc["by_sf"] = prev.get("by_sf", {})
        if "sf_dir" in prev and prev["sf_dir"] not in doc["by_sf"]:
            doc["by_sf"][prev["sf_dir"]] = {k: prev[k] for k in prev if k != "by_sf"}
    except (OSError, ValueError):
        pass
    doc["by_sf"][sf_dir] = out
    doc.update(out)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote ANN_RECALL.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
