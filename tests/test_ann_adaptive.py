"""Corpus-adaptive IVF-PQ rerank shortlist depth (VERDICT r8 #2).

A fixed shortlist depth is a measured recall cliff across scale decades
(depth-100 recall@10: 0.84 at sf0.1 → 0.68 at sf1.0 — ANN_RECALL.json):
the PQ index's ADC resolution is fixed, so vectors-per-quantization-cell
grows linearly with the corpus and true neighbors hide behind a linearly
growing crowd of ADC near-ties. These tests pin the adaptive rule
``max(50, ceil(n/20))``, that the operator DEFAULT applies it, that it
visibly diverges from the fixed depth-50 contract where it engages
(sf0.1: depth 100), and that the registered adaptive query hash-matches
its depth-rule-mirroring DuckDB oracle.
"""

from kafkasparkstream_spark.operators.similarity import (
    adaptive_shortlist_depth,
    ivfpq_rerank_topk,
)
from kafkasparkstream_spark.tables import load_table


def test_adaptive_depth_rule():
    # floor binds below 1000 vectors; ceil(n/20) above
    assert adaptive_shortlist_depth(0) == 50
    assert adaptive_shortlist_depth(500) == 50
    assert adaptive_shortlist_depth(1000) == 50
    assert adaptive_shortlist_depth(1001) == 51  # ceil engages
    assert adaptive_shortlist_depth(2000) == 100  # sf0.1
    assert adaptive_shortlist_depth(8000) == 400  # sf1.0
    assert adaptive_shortlist_depth(32000) == 1600  # sf10
    assert adaptive_shortlist_depth(999) == 50
    assert adaptive_shortlist_depth(1019) == 51


def test_default_is_adaptive_and_engages_at_sf01(spark):
    """At sf0.1 (2000 vectors) the default depth is 100, and the result
    must equal an explicit depth-100 call while IMPROVING on the pinned
    depth-50 contract (more true neighbors surface — the divergence that
    makes the adaptive gate non-vacuous)."""
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.1")
    auto = {tuple(r) for r in ivfpq_rerank_topk(emb).collect()}
    at100 = {tuple(r) for r in ivfpq_rerank_topk(emb, shortlist=100).collect()}
    at50 = {tuple(r) for r in ivfpq_rerank_topk(emb, shortlist=50).collect()}
    assert auto == at100
    assert auto != at50  # the rule visibly engages at this SF


def test_registered_adaptive_query_matches_mirrored_oracle(spark):
    """ann_ivfpq_rerank_adaptive at sf0.1, where depth = 100 ≠ the floor:
    the oracle computes the same max(50, ceil(COUNT(*)/20)) in SQL, so
    this checks the adaptive arithmetic cross-engine, not just the
    rerank."""
    import sys

    sys.path.insert(0, "tests")
    import __spark_entry__ as E
    from oracle import assert_matches_oracle

    sf = "/root/testdata/sf0.1"
    df = E.queries()["ann_ivfpq_rerank_adaptive"](spark, sf)
    assert_matches_oracle(
        df, E.oracle_sql()["ann_ivfpq_rerank_adaptive"], sf,
        name="ann_ivfpq_rerank_adaptive",
    )
