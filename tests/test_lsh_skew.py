"""Planted hot-bucket skew proof for MinHash-LSH (VERDICT r6 item 7).

exact_dedup collapses IDENTICAL docs before LSH, but near-identical clones
(distinct digests, ~equal shingle sets) all land in the same band buckets
and the all-pairs candidate join goes quadratic in the clone count. These
tests plant such a clique and pin (a) the blow-up is real in the explicit
all-pairs mode (``max_bucket_size=None`` — since r8 the operator DEFAULT
is the star cap), (b) the ``max_bucket_size`` star cap bounds candidates
to n−1 per hot bucket, and (c) connected-components clustering over the
star edges equals the full pair set's clusters FOR CLIQUE-SHAPED groups
like this fixture. That parity is clique-only: on the real sf1.0 replica
corpus, mixed-family hot buckets break it (0.09–0.4% of assignments —
SKEW_BENCH.json real_corpus_parity), which is why the registered capped
query is gated by a star-cap-MIRRORING oracle, not an all-pairs one. The
1k-clone wall-clock artifact lives in SKEW_BENCH.json
(scripts/skew_lsh_probe.py).
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
    full = minhash_lsh_pairs(df, max_bucket_size=None)
    # the clique's verified pairs are quadratic: C(120,2) = 7140
    assert full.count() >= 7140 * 0.95


def test_star_cap_bounds_candidates_and_preserves_clusters(spark):
    df = _planted(spark, clones=120)
    full = minhash_lsh_pairs(df, max_bucket_size=None)
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
    without the cap (the oracle contract for the registered query).
    Explicit None vs 50 — the operator DEFAULT is capped since r8."""
    df = _planted(spark, clones=8, normals=40)
    a = sorted(map(tuple, minhash_lsh_pairs(df, max_bucket_size=None).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(df, max_bucket_size=50).collect()))
    assert a == b


def test_default_is_capped(spark):
    """r7 verdict #2: a default-parameter user must get the scale-safe
    star-cap mode — a 120-clone clique yields star-sized, not quadratic,
    pair counts under the default."""
    df = _planted(spark, clones=120)
    n_default = minhash_lsh_pairs(df).count()
    assert n_default <= 4 * 120  # star edges per band, deduped


def test_registered_capped_query_matches_mirrored_oracle(spark):
    """The registry's dedup_minhash_lsh_capped (cap=2, so the star path
    executes even on gate-sized buckets) must hash-match its DuckDB
    oracle — which MIRRORS the star cap in SQL. This pins the ENGINE's
    capped semantics cross-engine; all-pairs cluster parity is NOT
    asserted anywhere (it is clique-only — see the module docstring and
    SKEW_BENCH.json real_corpus_parity)."""
    import sys

    sys.path.insert(0, "tests")
    import __spark_entry__ as E
    from oracle import assert_matches_oracle

    sf = "/root/testdata/sf0.01"
    df = E.queries()["dedup_minhash_lsh_capped"](spark, sf)
    assert_matches_oracle(
        df, E.oracle_sql()["dedup_minhash_lsh_capped"], sf,
        name="dedup_minhash_lsh_capped",
    )
