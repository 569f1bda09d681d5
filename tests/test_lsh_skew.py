"""Planted hot-bucket skew proof for MinHash-LSH (VERDICT r6 item 7).

exact_dedup collapses IDENTICAL docs before LSH, but near-identical clones
(distinct digests, ~equal shingle sets) all land in the same band buckets
and the all-pairs candidate join goes quadratic in the clone count. These
tests plant such a clique and pin (a) the blow-up is real in the default
all-pairs mode, (b) the ``max_bucket_size`` star cap bounds candidates to
n−1 per hot bucket, and (c) connected-components clustering over the star
edges yields EXACTLY the clusters of the full pair set — so cluster-level
dedup loses nothing to the cap. The 1k-clone wall-clock artifact lives in
SKEW_BENCH.json (scripts/skew_lsh_probe.py).
"""

from pyspark.sql import functions as F

from kafkasparkstream_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)


def _planted(spark, clones=120, normals=60):
    """`clones` near-identical docs (shared 30-token base + unique suffix,
    pairwise Jaccard ≈ 0.94) plus `normals` unrelated docs."""
    base = " ".join(f"tok{i}" for i in range(30))
    rows = [(i, base + f" uniq{i}") for i in range(clones)]
    rows += [
        (clones + i, " ".join(f"w{i}x{j}" for j in range(30)))
        for i in range(normals)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_clique_blows_up_all_pairs(spark):
    df = _planted(spark, clones=120)
    full = minhash_lsh_pairs(df)
    # the clique's verified pairs are quadratic: C(120,2) = 7140
    assert full.count() >= 7140 * 0.95


def test_star_cap_bounds_candidates_and_preserves_clusters(spark):
    df = _planted(spark, clones=120)
    full = minhash_lsh_pairs(df)
    capped = minhash_lsh_pairs(df, max_bucket_size=50)
    n_full, n_capped = full.count(), capped.count()
    # star: ≤ (clique_size − 1) pairs per band, deduped across bands
    assert n_capped <= 4 * 120
    assert n_capped < n_full / 10
    # every capped pair is a real verified pair of the full set
    assert capped.join(full, ["doc_a", "doc_b"], "left_anti").count() == 0
    # cluster parity: min-label components identical under star edges
    cf = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(full).collect()
    }
    cc = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(capped).collect()
    }
    assert cf == cc and len({c for _, c in cf if c is not None}) >= 1


def test_cap_is_noop_on_unskewed_corpus(spark):
    """Buckets under the cap must produce byte-identical output with and
    without the cap (the oracle contract for the registered query)."""
    df = _planted(spark, clones=8, normals=40)
    a = sorted(map(tuple, minhash_lsh_pairs(df).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(df, max_bucket_size=50).collect()))
    assert a == b
