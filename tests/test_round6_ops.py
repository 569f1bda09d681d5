"""Round-6 operator semantics: BPE merge training (greedy-fold contract vs a
pure-Python reference), perceptual dHash (exact pins on constructed pixels +
codec round-trips), DSIR importance direction, PQ codebook invariants, and
mixture-plan conservation laws."""

from __future__ import annotations

import numpy as np

from kafkasparkstream_spark.operators import codecs, multimodal
from kafkasparkstream_spark.operators.text import bpe_train_merges, dsir_importance


# --- BPE ------------------------------------------------------------------


def _ref_bpe(word_freqs: dict[str, int], merges: int):
    """Independent reference BPE (Sennrich et al. 2016): count adjacent
    symbol pairs over word types weighted by frequency; merge the argmax
    (count DESC, 'left right' ASC) greedily leftmost-first; repeat."""
    words = [(list(w), f) for w, f in sorted(word_freqs.items())]
    out = []
    for rank in range(1, merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (l, r), c = best
        out.append((rank, l, r, c))
        merged = l + r
        new_words = []
        for syms, f in words:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            new_words.append((ns, f))
        words = new_words
    return out


def test_bpe_matches_reference(spark):
    corpus = [
        ("low " * 5).strip(),
        ("lower " * 2).strip(),
        ("newest " * 6).strip(),
        ("widest " * 3).strip(),
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(df, merges=6).collect()
    ]
    freqs: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    assert got == _ref_bpe(freqs, 6)


def test_bpe_greedy_overlap(spark):
    """On 'aaa' with rule (a,a) greedy leftmost-first yields [aa, a] — the
    second pair must NOT re-merge across the already-consumed symbol."""
    df = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    rows = bpe_train_merges(df, merges=2).collect()
    # round 1: pairs of 'aaa' = (a,a) x2 per word x2 words = 4
    assert (rows[0]["left"], rows[0]["right"], rows[0]["pair_count"]) == ("a", "a", 4)
    # after merge each word is [aa, a]: best pair is (aa, a), count 2
    assert (rows[1]["left"], rows[1]["right"], rows[1]["pair_count"]) == ("aa", "a", 2)


# --- dHash ----------------------------------------------------------------


def test_dhash_monotone_gradients_exact():
    # luma strictly decreasing in x -> every left>right bit set -> -1 signed
    dec = np.tile(np.arange(255, 255 - 32 * 4, -4, dtype=np.uint8), (16, 1))
    img = dec[:, :, None].repeat(3, axis=2)
    assert multimodal._dhash_from_pixels(img) == -1
    # strictly increasing -> all bits clear -> 0
    inc = img[:, ::-1, :].copy()
    assert multimodal._dhash_from_pixels(inc) == 0


def test_dhash_stable_across_scale_and_codec():
    """Box-resampling a monotone gradient preserves monotonicity, so the
    dHash survives both a 2x upscale and a PNG encode->decode round-trip."""
    base = np.tile(np.arange(0, 128, 4, dtype=np.uint8), (16, 1))
    img = base[:, :, None].repeat(3, axis=2)
    h0 = multimodal._dhash_from_pixels(img)
    big = img.repeat(2, axis=0).repeat(2, axis=1)
    assert multimodal._dhash_from_pixels(big) == h0
    rt = codecs.png_decode(codecs.png_encode(img))
    assert multimodal._dhash_from_pixels(rt) == h0


def test_image_dhash_kernel_real_and_fallback(spark):
    grad = np.tile(np.arange(0, 160, 10, dtype=np.uint8), (8, 1))
    png = codecs.png_encode(grad[:, :, None].repeat(3, axis=2))
    rows = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(png)), (3, bytearray(b"garbage-bytes")),
         (4, bytearray(b"garbage-bytes")), (5, bytearray(b"other"))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in multimodal.image_dhash(rows).collect()}
    assert got[1]["decoded"] and got[2]["decoded"] and not got[3]["decoded"]
    assert got[1]["dhash"] == got[2]["dhash"]          # identical pixels
    assert got[3]["dhash"] == got[4]["dhash"]          # identical fallback bytes
    assert got[3]["dhash"] != got[5]["dhash"]          # distinct garbage separates
    assert (got[1]["width"], got[1]["height"]) == (16, 8)

    stats = multimodal.image_dhash_dedup(rows.select("asset_id", "payload")).collect()[0]
    assert stats["n_assets"] == 5
    assert stats["n_groups"] == 3
    assert stats["n_dup_groups"] == 2
    assert stats["max_group"] == 2
    assert stats["n_decoded"] == 2


# --- DSIR -----------------------------------------------------------------


def test_dsir_target_scores_above_offtarget(spark):
    rows = [
        (0, "the cat sat on the mat and the dog ran", "en"),
        (1, "the dog sat on the mat and the cat ran", "en"),
        (2, "der hund sitzt auf der matte und der hund", "de"),
        (3, "der katze auf der matte sitzt und der baum", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = {r["doc_id"]: r["dsir_weight"] for r in dsir_importance(df).collect()}
    assert min(w[0], w[1]) > max(w[2], w[3])


# --- PQ -------------------------------------------------------------------


def test_pq_distortion_invariants(spark):
    from kafkasparkstream_spark.operators.similarity import pq_distortion

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=64).astype(np.float32)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = pq_distortion(df, n_subspaces=4, n_centroids=16, dim=64).collect()
    per_sub: dict[int, int] = {}
    for r in out:
        per_sub[r["subspace"]] = per_sub.get(r["subspace"], 0) + r["n_assigned"]
        assert r["distortion_micro"] >= 0
    # every vector assigned exactly once per subspace
    assert per_sub == {0: 40, 1: 40, 2: 40, 3: 40}
    # seeds are their own codewords: total distortion of the 16 seed rows is 0,
    # so summed distortion over all rows is strictly less than a one-centroid
    # codebook's would be; cheap proxy: at least one zero-distance assignment
    # per subspace exists (the seed itself).
    seeds = pq_distortion(df.filter("vec_id < 16"), n_subspaces=4, n_centroids=16, dim=64)
    assert all(r["distortion_micro"] == 0 for r in seeds.collect())


# --- Mixture plan ---------------------------------------------------------


def test_mixture_plan_conservation(spark):
    from kafkasparkstream_spark.operators.sampling import mixture_epochs_plan

    rows = [
        (0, "a b c d e f g h", "en", "s0"),
        (1, "a b c d", "en", "s0"),
        (2, "x y z w q r", "de", "s1"),
        (3, "a b c d e f", "en", "s1"),
        (4, "m n o p q r s t u v", "fr", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = mixture_epochs_plan(df, budget_multiple=2).collect()
    total = sum(r["src_tokens"] for r in out)
    assert sum(r["weight_bp"] for r in out) <= 10000
    assert sum(r["planned_tokens"] for r in out) <= 2 * total
    s2 = [r for r in out if r["source"] == "s2"][0]
    assert s2["lang_tokens"] == 0 and s2["weight_bp"] == 0 and s2["epochs_milli"] == 0


def test_curriculum_distributed_path_matches_window_path(spark):
    """global_exact_ntile's distributed leg (forced via threshold=0) must
    reproduce the single-window plan row-for-row for the curriculum rollup."""
    from kafkasparkstream_spark.operators.text import curriculum_difficulty_deciles
    from kafkasparkstream_spark.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    a = [tuple(r) for r in curriculum_difficulty_deciles(docs).collect()]
    b = [tuple(r) for r in
         curriculum_difficulty_deciles(docs, distributed_threshold=0).collect()]
    assert a == b and len(a) == 10


# --- Logreg + media inventory ----------------------------------------------


def test_logreg_learns_direction(spark):
    """More iterations must not increase training loss, and the stopword
    feature must get a positive weight when stopword-heavy docs are the
    positive class (labels here: lang='en')."""
    from kafkasparkstream_spark.operators.text import quality_logreg_fit
    from kafkasparkstream_spark.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    l1 = quality_logreg_fit(docs, iterations=1).collect()[0]["log_loss"]
    l5 = quality_logreg_fit(docs, iterations=5).collect()[0]["log_loss"]
    import math
    assert l5 <= l1 <= math.log(2) + 1e-9  # w=0 gives ln 2; GD must not regress


def test_media_inventory_kinds(spark):
    from kafkasparkstream_spark.operators import multimodal
    from kafkasparkstream_spark.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(40)
    probed = multimodal.media_probe(multimodal.synthesize_media_assets(docs))
    rows = {r["asset_id"]: r for r in probed.collect()}
    assert len(rows) == 40
    for i, r in rows.items():
        expect = ("png", "wav", "mp3", "flac")[i % 4]
        assert r["kind"] == expect, (i, r)
        assert r["n_units"] > 0


def test_exact_substring_removal_semantics(spark):
    """Hand-computed span removal: a trigram shared by two docs removes
    exactly its covered tokens in both; within-doc repeats count toward the
    >=2 threshold; overlapping duplicated trigrams merge their coverage."""
    import hashlib
    from kafkasparkstream_spark.operators.text import remove_duplicated_spans

    docs = spark.createDataFrame(
        [(0, "a b c x y z"), (1, "a b c q r s"), (2, "p p p p")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in remove_duplicated_spans(docs, n=3).collect()}

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    # "a b c" occurs in docs 0 and 1 -> tokens 0..2 removed from both
    assert got[0]["n_removed"] == 3 and got[0]["cleaned_md5"] == h("x y z")
    assert got[1]["n_removed"] == 3 and got[1]["cleaned_md5"] == h("q r s")
    # "p p p" occurs twice WITHIN doc 2 (starts 0 and 1) -> all 4 tokens go
    assert got[2]["n_removed"] == 4 and got[2]["cleaned_md5"] == h("")


def test_bpe_encode_fertility_bounds(spark):
    """Encoding with merges can never go below 1 symbol/word or above the
    character count; more merges must not increase total symbols."""
    from kafkasparkstream_spark.operators.text import bpe_encode_stats
    from kafkasparkstream_spark.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    r8 = {r["lang"]: r for r in bpe_encode_stats(docs, merges=8).collect()}
    r0 = {r["lang"]: r for r in bpe_encode_stats(docs, merges=0).collect()}
    for lang, row in r8.items():
        assert row["ws_tokens"] <= row["bpe_tokens"] <= row["n_chars"]
        assert row["bpe_tokens"] <= r0[lang]["bpe_tokens"]  # merges only shrink
        assert r0[lang]["bpe_tokens"] == r0[lang]["n_chars"]  # 0 merges = chars


def test_multiprobe_recall_dominates_single_probe(spark):
    from kafkasparkstream_spark.tables import load_table
    import __spark_entry__ as E

    rows = {r["method"]: r for r in
            E.queries()["ann_recall_report"](spark, "/root/testdata/sf0.001").collect()}
    assert rows["lsh_multiprobe"]["recall"] >= rows["lsh"]["recall"]
    assert rows["quantized"]["recall"] >= 0.9  # int8 on 64-dim barely degrades


def test_ivfpq_recall_between_bounds(spark):
    """IVF-PQ (4-byte codes, 2 probes) must beat single-probe LSH but can't
    beat its own coarse router (uncompressed IVF at the same nprobe)."""
    import __spark_entry__ as E

    rows = {r["method"]: r for r in
            E.queries()["ann_recall_report"](spark, "/root/testdata/sf0.001").collect()}
    assert rows["ivfpq"]["recall"] >= rows["lsh"]["recall"]
    assert rows["ivfpq"]["recall"] <= rows["ivf"]["recall"]


def test_ivfpq_rerank_breaks_adc_ceiling(spark):
    """The exact re-rank over a 50-deep shortlist must dominate ADC-only
    IVF-PQ and approach (never exceed) the coarse router's own recall."""
    import __spark_entry__ as E

    rows = {r["method"]: r for r in
            E.queries()["ann_recall_report"](spark, "/root/testdata/sf0.001").collect()}
    assert rows["ivfpq_rerank"]["recall"] > rows["ivfpq"]["recall"]
    assert rows["ivfpq_rerank"]["recall"] <= rows["ivf"]["recall"] + 1e-9


def test_mixture_plan_zero_target_lang_is_all_zero(spark):
    """r6 ADVICE: a corpus with no target-language tokens must yield a
    deterministic all-zero plan (matching the oracle's CASE guard), not
    NULL weights."""
    from kafkasparkstream_spark.operators.sampling import mixture_epochs_plan

    docs = spark.createDataFrame(
        [("a", "de", "hallo welt"), ("b", "fr", "bonjour le monde")],
        "source string, lang string, text string",
    )
    rows = mixture_epochs_plan(docs, budget_multiple=2).collect()
    assert rows and all(
        r["weight_bp"] == 0 and r["planned_tokens"] == 0 and r["epochs_milli"] == 0
        for r in rows
    )


def test_decontamination_zero_norm_eval_vector_errors(spark):
    """r6 ADVICE: a zero-norm eval embedding must raise a named ValueError
    at plan-build time, not ZeroDivisionError."""
    import pytest as _pytest

    from kafkasparkstream_spark.operators.similarity import (
        embedding_decontamination,
    )

    emb = spark.createDataFrame(
        [(i, "x", [0.0] * 4 if i == 3 else [float(i + 1)] * 4) for i in range(12)],
        "vec_id long, label string, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="zero norm"):
        embedding_decontamination(emb, num_eval=10)


def test_bpe_oracle_survives_merge_exhaustion(spark, tmp_path):
    """r7 review finding: if the corpus exhausts mergeable pairs before the
    requested rounds, Spark breaks early but still encodes with the learned
    rules; the unrolled SQL twin must pass rows through unmerged on the
    empty rounds (LEFT JOIN ON TRUE) instead of cross-joining the encode
    chain to empty."""
    import shutil

    import duckdb

    import __spark_entry__ as E
    import sys

    sys.path.insert(0, "tests")
    from oracle import assert_matches_oracle

    sf = str(tmp_path)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{sf}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        """COPY (SELECT * FROM (VALUES
        (0, 'ab ab ab', 'en', 'web'), (1, 'ab ab', 'en', 'web'),
        (2, 'ab', 'de', 'web')) t(doc_id, text, lang, source))
        TO '{}/documents.parquet' (FORMAT PARQUET)""".format(sf)
    )
    con.close()
    # one learnable merge (a,b), then exhaustion at round 2 of 8
    mt = E.queries()["bpe_merge_table"](spark, sf)
    assert_matches_oracle(mt, E.oracle_sql()["bpe_merge_table"], sf,
                          name="bpe_merge_table")
    assert mt.count() == 1
    es = E.queries()["bpe_encode_stats"](spark, sf)
    assert_matches_oracle(es, E.oracle_sql()["bpe_encode_stats"], sf,
                          name="bpe_encode_stats")
    assert es.count() == 2  # en + de rows survive the empty rounds


def test_pca_certificate_zero_trace_errors(spark):
    """r7 review finding: a collapsed corpus (zero covariance) must raise a
    named error, not emit NaN certificates."""
    import pytest as _pytest

    from kafkasparkstream_spark.operators.similarity import (
        pca_spectrum_certificate,
    )

    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="trace is zero"):
        pca_spectrum_certificate(emb)
    # r8 review: NON-dyadic constant vectors must also raise (this corpus
    # cancels to exactly 0.0 on this build, but float32 casts make that a
    # build detail, not a guarantee).
    emb_neg = spark.createDataFrame(
        [(i, [0.1] * 64) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="trace is zero"):
        pca_spectrum_certificate(emb_neg)


def test_pca_certificate_negative_trace_from_cancellation(spark, monkeypatch):
    """r8 review: a near-constant corpus can cancel G − n·μμᵀ to a TINY
    NEGATIVE trace; the guard must raise the named error, not NaN the
    log10 mantissa extraction into 'cannot convert float NaN to integer'."""
    import numpy as np
    import pytest as _pytest

    from kafkasparkstream_spark.operators import similarity

    monkeypatch.setattr(
        similarity, "_cov_one_pass",
        lambda df, vec_col: (50, np.full((4, 4), -1e-18 / 4)),
    )
    emb = spark.createDataFrame(
        [(0, [0.1] * 4)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="trace is zero"):
        similarity.pca_spectrum_certificate(emb)
