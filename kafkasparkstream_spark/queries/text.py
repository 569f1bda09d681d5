"""Text analysis — training-data-pipeline operators over `documents`
(quality, language, tokenization, BPE, selection and mixture planning)."""

from __future__ import annotations

from kafkasparkstream_spark.operators import sampling  # noqa: E402
from kafkasparkstream_spark.operators import text as text_ops  # noqa: E402
from kafkasparkstream_spark.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from kafkasparkstream_spark.queries._shared import (  # noqa: E402
    register,
)

@register(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    df = text_ops.token_count(load_table(spark, "documents", sf_dir))
    return df.select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
        F.col("n_chars_measured").cast("long").alias("n_chars_measured"),
    )


@register(
    "quality_score",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), ' +') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id,
               len(toks) AS n,
               len(list_distinct(toks)) AS n_uniq,
               len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) AS n_stop,
               CAST(list_sum(list_transform(toks, tk -> length(tk))) AS DOUBLE) AS len_sum
        FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT)      AS n_tokens,
           CAST(n_uniq AS BIGINT) AS n_uniq_tokens,
           ROUND(len_sum / n, 4)  AS avg_token_len,
           ROUND(CAST(n_stop AS DOUBLE) / n, 4) AS stopword_ratio,
           ROUND(CAST(n_uniq AS DOUBLE) / n, 4) AS uniq_ratio,
           ROUND(least(n / 64.0, 1.0)
                 * (0.5 + 0.5 * least(n_stop / greatest(n * 0.05, 1.0), 1.0))
                 * (CAST(n_uniq AS DOUBLE) / n), 4) AS quality
    FROM m
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword / diversity quality heuristics per document."""
    df = text_ops.quality_score(load_table(spark, "documents", sf_dir))
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_uniq_tokens").cast("long").alias("n_uniq_tokens"),
        "avg_token_len",
        "stopword_ratio",
        "uniq_ratio",
        "quality",
    )


@register(
    "lang_id",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, lang,
            CAST(len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], tk))) AS INT) AS score_de,
            CAST(len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) AS INT)        AS score_en,
            CAST(len(list_filter(toks, tk -> list_contains(['el','la','de','que','y','en','un','es'], tk))) AS INT)           AS score_es,
            CAST(len(list_filter(toks, tk -> list_contains(['le','la','de','et','est','un','une','dans'], tk))) AS INT)       AS score_fr,
            CAST(len(list_filter(toks, tk -> list_contains(['de','le','shi','bu','wo','you','zai','ta'], tk))) AS INT)        AS score_zh
        FROM t
    )
    SELECT doc_id, lang, score_de, score_en, score_es, score_fr, score_zh,
           CASE
             WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'de'
             WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'en'
             WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'es'
             WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'fr'
             WHEN score_zh = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'zh'
             ELSE 'unknown'
           END AS pred_lang
    FROM s
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language heuristic (argmax over per-lang scores)."""
    return text_ops.lang_id(load_table(spark, "documents", sf_dir))


@register(
    "doc_fingerprint",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        FROM documents
    )
    SELECT doc_id,
           array_to_string(
             (list_sort(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                        i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))))[1:5],
             '|') AS fingerprint
    FROM t
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-5 md5 sketch over word 3-gram shingles (rolling-hash analog)."""
    return text_ops.doc_fingerprint(load_table(spark, "documents", sf_dir))


@register(
    "top_vocab",
    oracle="""
    WITH t AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents)
    SELECT tok, COUNT(*) AS cnt
    FROM t GROUP BY tok
    ORDER BY cnt DESC, tok
    LIMIT 50
    """,
)
def top_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-50 by frequency — explode + map-side-combined
    count + TakeOrdered; the canonical word-count at any scale."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(50)
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT tok, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (SELECT doc_id, tok, tf, doc_freq,
                      ROUND(tf * ln(CAST(n_docs AS DOUBLE) / doc_freq), 4) AS tfidf
               FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                            ORDER BY tfidf DESC, tok) AS rn
               FROM scored)
    SELECT doc_id, tok AS top_term, tf, doc_freq, tfidf
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (idf = ln(N/df)) top term per document — explode → tf agg →
    broadcast vocabulary df → rank per doc."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.tfidf_top_terms(docs)


@register(
    "bm25_search",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
    ),
    lengths AS (SELECT doc_id, len(t) AS dl FROM toks),
    exploded AS (
        SELECT doc_id, unnest(t) AS term FROM toks
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM exploded
        WHERE term IN ('hash', 'join', 'filter')
        GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lengths),
    scored AS (
        SELECT tf.doc_id,
               SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS s
        FROM tf JOIN dfreq USING (term) JOIN lengths USING (doc_id), stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(s, 4) AS bm25
    FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (query: hash, join, filter) — top-20 docs by
    closed-form score; complements the embedding-space ANN operators."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.bm25_scores(docs, ("hash", "join", "filter"))


@register(
    "text_normalize_stats",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               CAST(length(text) AS INT) AS raw_chars,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                   ' +', ' ', 'g')) AS norm_text
        FROM documents
    )
    SELECT doc_id, raw_chars, CAST(length(norm_text) AS INT) AS norm_chars, norm_text
    FROM n ORDER BY doc_id
    """,
)
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase / strip punctuation /
    collapse whitespace) with before/after size accounting."""
    docs = load_table(spark, "documents", sf_dir)
    out = text_ops.normalize_text(docs)
    return out.select(
        "doc_id",
        F.col("raw_chars").cast("int").alias("raw_chars"),
        F.col("norm_chars").cast("int").alias("norm_chars"),
        "norm_text",
    ).orderBy("doc_id")


@register(
    "decontamination_8gram",
    oracle="""
    WITH t AS (SELECT doc_id, source, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    sh AS (SELECT doc_id, source,
                  unnest(list_distinct(list_transform(
                      range(1, greatest(len(toks) - 7, 0) + 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                           || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
                           || ' ' || toks[i+6] || ' ' || toks[i+7]))) AS sh
           FROM t),
    bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
    train AS (SELECT doc_id, sh FROM sh WHERE source <> 'src0')
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           COUNT(b.sh) AS n_contaminated,
           ROUND(COUNT(b.sh) * 1.0 / COUNT(*), 4) AS contamination_ratio
    FROM train LEFT JOIN bench b ON train.sh = b.sh
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def decontamination_8gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: fraction of each training doc's distinct
    8-grams that appear in the benchmark set (source src0); the benchmark
    shingle set is tiny → broadcast, so the training side never shuffles."""
    return text_ops.decontamination_overlap(load_table(spark, "documents", sf_dir))


@register(
    "split_leakage_check",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                      range(1, greatest(len(toks) - 7, 0) + 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                           || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
                           || ' ' || toks[i+6] || ' ' || toks[i+7]))) AS sh
           FROM t),
    lab AS (SELECT doc_id,
                   CAST(('0x' || substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 < 90 AS is_train
            FROM documents),
    train AS (SELECT DISTINCT sh.sh FROM sh JOIN lab USING (doc_id) WHERE is_train),
    test AS (SELECT sh.doc_id, sh.sh FROM sh JOIN lab USING (doc_id) WHERE NOT is_train)
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           COUNT(train.sh) AS n_leaked,
           ROUND(COUNT(train.sh) * 1.0 / COUNT(*), 4) AS leak_ratio
    FROM test LEFT JOIN train ON test.sh = train.sh
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test 8-gram contamination audit over the md5-hash 90/10 split:
    per test doc, how much of it leaks from the train side. Train shingles
    are never globally distinct'd — they semi-join against the test shingle
    set first. ``broadcast_test=False`` because this is a PROPORTIONAL
    split — the test side is 10% of the corpus (10 TB at target scale) and
    must shuffle, not broadcast (text.py split_leakage_overlap docstring;
    the broadcast path stays covered by
    test_split_leakage_shuffle_mode_matches_broadcast_mode)."""
    return text_ops.split_leakage_overlap(
        load_table(spark, "documents", sf_dir), broadcast_test=False
    )


@register(
    "gopher_rule_matrix",
    oracle="""
    WITH f AS (
        SELECT source,
               len(string_split_regex(trim(text), ' +')) AS ntok,
               (length(trim(text)) - (len(string_split_regex(trim(text), ' +')) - 1)) * 1.0
                   / len(string_split_regex(trim(text), ' +')) AS mwl,
               len(list_filter(string_split_regex(trim(text), ' +'),
                               x -> x IN ('the', 'a'))) AS nstop,
               len(list_distinct(string_split_regex(trim(text), ' +'))) * 1.0
                   / len(string_split_regex(trim(text), ' +')) AS uniq
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN ntok BETWEEN 30 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordcount,
           CAST(SUM(CASE WHEN mwl BETWEEN 4.0 AND 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS pass_mean_word_len,
           CAST(SUM(CASE WHEN nstop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopwords,
           CAST(SUM(CASE WHEN uniq >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS pass_uniq_ratio,
           CAST(SUM(CASE WHEN ntok BETWEEN 30 AND 90 AND mwl BETWEEN 4.0 AND 5.0
                         AND nstop >= 2 AND uniq >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all,
           ROUND(SUM(CASE WHEN ntok BETWEEN 30 AND 90 AND mwl BETWEEN 4.0 AND 5.0
                          AND nstop >= 2 AND uniq >= 0.4 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS pass_rate
    FROM f GROUP BY source ORDER BY source
    """,
)
def gopher_rule_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source independent Gopher-rule pass matrix — which quality rule
    cuts which source (vs the funnel's cumulative survivors)."""
    return text_ops.gopher_rule_matrix(load_table(spark, "documents", sf_dir))


@register(
    "quality_filter_funnel",
    oracle="""
    WITH f AS (
        SELECT n_chars, lang,
               len(string_split_regex(trim(text), ' +')) AS ntok,
               length(trim(text)) AS tlen
        FROM documents
    ),
    g AS (
        SELECT COUNT(*) AS c0,
               CAST(SUM(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN n_chars >= 150
                             AND lang IN ('en','de','fr','es') THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2,
               CAST(SUM(CASE WHEN n_chars >= 150
                             AND lang IN ('en','de','fr','es')
                             AND ntok >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
               CAST(SUM(CASE WHEN n_chars >= 150
                             AND lang IN ('en','de','fr','es')
                             AND ntok >= 30
                             AND (tlen - (ntok - 1)) * 1.0 / ntok
                                 BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c4
        FROM f
    )
    SELECT * FROM (
        SELECT CAST(0 AS INT) AS stage, 'all' AS stage_name, c0 AS n_docs,
               ROUND(c0 * 1.0 / c0, 4) AS retention FROM g
        UNION ALL SELECT 1, 'min_chars', c1, ROUND(c1 * 1.0 / c0, 4) FROM g
        UNION ALL SELECT 2, 'lang_known', c2, ROUND(c2 * 1.0 / c0, 4) FROM g
        UNION ALL SELECT 3, 'min_tokens', c3, ROUND(c3 * 1.0 / c0, 4) FROM g
        UNION ALL SELECT 4, 'mean_word_len', c4, ROUND(c4 * 1.0 / c0, 4) FROM g
    ) ORDER BY stage
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative quality-filter survivor counts in ONE scan (conditional
    sums unpivoted via stack) — the standard corpus-curation funnel report."""
    return text_ops.quality_filter_funnel(load_table(spark, "documents", sf_dir))


@register(
    "pii_scan_stats",
    oracle=r"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(SUM(CASE WHEN regexp_matches(text,
                '[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}')
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
           CAST(SUM(CASE WHEN regexp_matches(text, '(^| )[a-z]{1,3}( |$)')
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_short_token,
           ROUND((SUM(CASE WHEN regexp_matches(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                     THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN regexp_matches(text,
                        '[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}')
                        THEN 1 ELSE 0 END)) * 1.0 / COUNT(*), 4)
               AS pii_doc_ratio
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def pii_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language PII exposure report (email/phone regex in codegen, no
    Python in the scan) with a populated control column on synthetic data."""
    return text_ops.pii_scan_stats(load_table(spark, "documents", sf_dir))


@register(
    "doc_repetition_stats",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    r AS (SELECT doc_id, toks, len(toks) AS n,
                 len(list_distinct(toks)) AS nu,
                 list_max(list_transform(list_distinct(toks),
                          u -> len(list_filter(toks, x -> x = u)))) AS topc,
                 list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                i -> toks[i] || ' ' || toks[i+1]) AS bi
          FROM t)
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           ROUND(1.0 - nu * 1.0 / n, 4) AS dup_token_ratio,
           ROUND(topc * 1.0 / n, 4) AS top_token_ratio,
           CASE WHEN len(bi) > 0
                THEN ROUND(1.0 - len(list_distinct(bi)) * 1.0 / len(bi), 4)
                ELSE 0.0 END AS dup_bigram_ratio
    FROM r ORDER BY doc_id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals (dup-token, top-token,
    dup-bigram ratios) as pure per-row array expressions — zero shuffle."""
    out = text_ops.repetition_stats(load_table(spark, "documents", sf_dir))
    return out.withColumn("n_tokens", F.col("n_tokens").cast("int")).orderBy("doc_id")


@register(
    "token_length_histogram",
    oracle="""
    WITH e AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS tok
               FROM documents)
    SELECT CAST(length(tok) AS INT) AS token_len,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT tok) AS n_distinct_tokens
    FROM e GROUP BY 1 ORDER BY 1
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length distribution: explode → hash-agg on ~30 keys,
    map-side partials collapse the shuffle to O(splits × lengths)."""
    return text_ops.token_length_histogram(load_table(spark, "documents", sf_dir))


@register(
    "sample_k_per_lang",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(('0x' || substr(md5('k0' || CAST(doc_id AS VARCHAR)), 1, 8))
                                 AS BIGINT), doc_id) AS sample_rank
        FROM documents)
    SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
    FROM r WHERE sample_rank <= 20 ORDER BY lang, sample_rank
    """,
)
def sample_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language deterministic reservoir: rank by md5(id)
    within language — same survivors on any engine / partitioning / rerun."""
    docs = load_table(spark, "documents", sf_dir)
    out = sampling.sample_k_per_group(docs, "doc_id", "lang", k=20)
    return out.select("doc_id", "lang", "sample_rank").orderBy("lang", "sample_rank")


@register(
    "source_mixture_temperature",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (SELECT source, n_docs,
                 CAST(ROUND(sqrt(n_docs), 6) AS DECIMAL(18,6)) AS w FROM c)
    SELECT source, n_docs,
           ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 4) AS raw_share,
           ROUND(CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE), 4) AS temp_share
    FROM w ORDER BY source
    """,
)
def source_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (α=0.5) source-mixing report: weights ∝ sqrt(n), snapped
    to the 6-dp grid and summed as decimal so normalization is exact."""
    return sampling.temperature_mixture(load_table(spark, "documents", sf_dir))


@register(
    "shard_balance_stats",
    oracle="""
    WITH s AS (
        SELECT *,
               CAST(CAST(('0x' || substr(md5('shard0' || CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 16 AS INT) AS shard
        FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM s GROUP BY shard ORDER BY shard
    """,
)
def shard_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash shard assignment (16 shards) + the per-shard balance
    report an export stage runs before committing training shards."""
    return sampling.shard_stats(load_table(spark, "documents", sf_dir))


@register(
    "pack_sequences_512",
    oracle="""
    WITH t AS (
        SELECT lang, source, doc_id,
               len(string_split_regex(trim(text), ' +')) AS ntok
        FROM documents
    ),
    c AS (
        SELECT lang, source, ntok,
               SUM(ntok) OVER (PARTITION BY lang, source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT lang, source,
           CAST(floor((cum - ntok) / 512.0) AS INT) AS seq_no,
           COUNT(*) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS seq_tokens,
           CAST(SUM(ntok) AS BIGINT) * 10000 // 512 AS fill_bp
    FROM c
    GROUP BY lang, source, seq_no
    ORDER BY lang, source, seq_no
    """,
)
def pack_sequences_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-fill packing of documents into 512-token training
    sequences per (lang, source) stream — keyed window cumsum, parallel by
    corpus stream, no global sort."""
    return sampling.pack_sequences(load_table(spark, "documents", sf_dir), budget=512)


@register(
    "doc_token_entropy",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
               FROM documents),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
    e AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS nu,
                 log2(SUM(c)) - SUM(c * log2(c)) / SUM(c) AS ent
          FROM c GROUP BY 1)
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           CAST(nu AS INT) AS n_uniq_tokens,
           ROUND(ent, 4) AS entropy,
           CASE WHEN nu > 1 THEN ROUND(ent / log2(nu), 4) END AS entropy_ratio
    FROM e ORDER BY doc_id
    """,
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-distribution Shannon entropy + normalized ratio (the
    low-entropy boilerplate filter) — log2(n) − Σ c·log2(c)/n over one
    explode + two keyed hash-aggs, linear in corpus size."""
    return text_ops.token_entropy(load_table(spark, "documents", sf_dir)).orderBy(
        "doc_id"
    )


@register(
    "ngram_novelty_rate",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    s AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(
                     range(1, greatest(len(toks) - 2, 0) + 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
          FROM t),
    f AS (SELECT sh, MIN(doc_id) AS first_doc FROM s GROUP BY sh)
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           ROUND(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS novelty_ratio
    FROM s JOIN f USING (sh)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's distinct 3-grams first seen in that doc
    (corpus-position novelty curve; first-occurrence attribution by
    min doc_id)."""
    return text_ops.ngram_novelty(load_table(spark, "documents", sf_dir))


@register(
    "doc_chunk_overlap",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    b AS (
        SELECT doc_id, n_tokens,
               CAST(48 * CAST(ceil(greatest(0, n_tokens - 64) / 48.0) AS BIGINT) AS INT)
                   AS last_start
        FROM d
    ),
    e AS (
        SELECT doc_id, n_tokens,
               unnest(generate_series(0, last_start, 48)) AS i
        FROM b
    )
    SELECT doc_id,
           CAST(i / 48 AS INT)  AS chunk_idx,
           CAST(i AS INT)       AS chunk_start,
           CAST(least(64, n_tokens - i) AS INT) AS chunk_len,
           n_tokens
    FROM e
    ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunk plan (64-token windows, stride 48): closed-form
    sequence + explode, no shuffle — both engines derive identical chunk
    grids from the token count alone."""
    return text_ops.chunk_documents(
        load_table(spark, "documents", sf_dir), size=64, stride=48
    )


@register(
    "bigram_top_per_lang",
    oracle="""
    WITH t AS (
        SELECT lang, string_split_regex(trim(text), ' +') AS l FROM documents
    ),
    e AS (
        SELECT lang, l, unnest(generate_series(1, len(l) - 1)) AS i
        FROM t WHERE len(l) > 1
    ),
    b AS (SELECT lang, l[i] || ' ' || l[i + 1] AS bigram FROM e),
    c AS (SELECT lang, bigram, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
    r AS (
        SELECT lang, bigram, cnt,
               row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram)
                   AS rnk
        FROM c
    )
    SELECT lang, bigram, cnt, CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= 10 ORDER BY lang, rnk
    """,
)
def bigram_top_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 bigram collocations per language: row-local zip_with bigrams,
    one (lang, bigram) hash-agg, rank over distinct-bigram cardinality."""
    return text_ops.top_bigrams_per_group(
        load_table(spark, "documents", sf_dir), group_col="lang", k=10
    )


@register(
    "vocab_overlap_sources",
    oracle="""
    WITH v AS (
        SELECT DISTINCT source AS grp, tok
        FROM (SELECT source, unnest(string_split_regex(trim(text), ' +')) AS tok
              FROM documents)
    ),
    sz AS (SELECT grp, COUNT(*) AS n_vocab FROM v GROUP BY 1),
    c AS (
        SELECT a.grp AS source_a, b.grp AS source_b, COUNT(*) AS common_tokens
        FROM v a JOIN v b ON a.tok = b.tok AND a.grp < b.grp
        GROUP BY 1, 2
    )
    SELECT source_a, source_b,
           x.n_vocab AS vocab_a, y.n_vocab AS vocab_b, common_tokens,
           ROUND(common_tokens * 1.0
                 / (x.n_vocab + y.n_vocab - common_tokens), 4) AS jaccard
    FROM c JOIN sz x ON source_a = x.grp JOIN sz y ON source_b = y.grp
    ORDER BY source_a, source_b
    """,
)
def vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — distinct (source, tok)
    grain bounds the self-join fanout to |sources| per token."""
    return text_ops.vocab_jaccard_between_groups(
        load_table(spark, "documents", sf_dir), group_col="source"
    )


@register(
    "lang_confusion_matrix",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, lang,
            CAST(len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], tk))) AS INT) AS score_de,
            CAST(len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) AS INT)        AS score_en,
            CAST(len(list_filter(toks, tk -> list_contains(['el','la','de','que','y','en','un','es'], tk))) AS INT)           AS score_es,
            CAST(len(list_filter(toks, tk -> list_contains(['le','la','de','et','est','un','une','dans'], tk))) AS INT)       AS score_fr,
            CAST(len(list_filter(toks, tk -> list_contains(['de','le','shi','bu','wo','you','zai','ta'], tk))) AS INT)        AS score_zh
        FROM t
    ), p AS (
        SELECT lang,
               CASE
                 WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'de'
                 WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'en'
                 WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'es'
                 WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'fr'
                 WHEN score_zh = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'zh'
                 ELSE 'unknown'
               END AS pred_lang
        FROM s
    )
    SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY lang), 4)
               AS share_of_lang
    FROM p GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality report: labeled vs predicted language counts and
    per-label shares — the heuristic's scoring scan plus a ~|langs|² agg."""
    from pyspark.sql.window import Window as W

    pred = text_ops.lang_id(load_table(spark, "documents", sf_dir))
    cm = pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))
    per_lang = W.partitionBy("lang")
    return cm.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(per_lang), 4).alias(
            "share_of_lang"
        ),
    ).orderBy("lang", "pred_lang")


@register(
    "token_fertility_by_lang",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
               AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')))
                AS BIGINT) AS bpe_tokens,
           ROUND(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')))
                 * 1.0 / SUM(len(string_split_regex(trim(text), ' +'))), 4)
               AS fertility,
           ROUND(SUM(length(text)) * 1.0
                 / SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))), 4)
               AS chars_per_bpe_token
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subwords per word, chars per subword) per
    language — projection + one tiny hash-agg."""
    return text_ops.token_fertility_by_lang(load_table(spark, "documents", sf_dir))


@register(
    "quality_weighted_sample",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id, lang,
               len(toks) AS n,
               len(list_distinct(toks)) AS n_uniq,
               len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) AS n_stop
        FROM t
    ), q AS (
        SELECT doc_id, lang,
               ROUND(least(n / 64.0, 1.0)
                     * (0.5 + 0.5 * least(n_stop / greatest(n * 0.05, 1.0), 1.0))
                     * (CAST(n_uniq AS DOUBLE) / n), 4) AS quality,
               (CAST(('0x' || substr(md5('qw0' || CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 10000) / 10000.0 AS u
        FROM m
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN u < least(1.0, 2.0 * quality) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN u < least(1.0, 2.0 * quality) THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS keep_rate,
           ROUND(AVG(quality), 4) AS avg_quality_before,
           ROUND(AVG(CASE WHEN u < least(1.0, 2.0 * quality) THEN quality END), 4)
               AS avg_quality_after
    FROM q GROUP BY 1 ORDER BY 1
    """,
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional importance sampling (keep-prob = min(1, 2q),
    deterministic md5 uniform): per-language keep rates and the before/after
    mean-quality lift."""
    from kafkasparkstream_spark.operators import sampling as sampling_ops

    docs = load_table(spark, "documents", sf_dir)
    # quality inline in the scan projection — the old quality_score
    # self-join re-scanned the corpus and paid an exchange for a per-row
    # function of text (guide §2.4).
    with_lang = docs.select(
        "doc_id", "lang", text_ops.quality_col("text").alias("quality")
    )
    return sampling_ops.quality_weighted_sample(with_lang)


@register(
    "unigram_logprob_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
        FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    vocab AS (SELECT tok, SUM(c) AS vc FROM tf GROUP BY 1),
    tot AS (SELECT CAST(SUM(vc) AS DOUBLE) AS n FROM vocab)
    SELECT doc_id,
           ROUND(SUM(c * LOG2(vc / n)) / SUM(c), 4) AS mean_logprob,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM tf JOIN vocab USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-lite quality signal: per-doc mean token log2-probability
    under the corpus's own unigram distribution — one fact-sized shuffle,
    vocab broadcast (see operators/text.py:unigram_logprob)."""
    docs = load_table(spark, "documents", sf_dir)
    out = text_ops.unigram_logprob(docs)
    return out.select("doc_id", "mean_logprob", F.col("n_tokens").cast("long").alias("n_tokens"))


@register(
    "duplicated_span_stats",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS span
        FROM t
    ),
    c AS (SELECT doc_id, span, COUNT(*) OVER (PARTITION BY span) AS n_docs FROM sh)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicated,
           ROUND(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / COUNT(*), 4) AS dup_ratio
    FROM c GROUP BY doc_id ORDER BY doc_id
    """,
)
def duplicated_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication evidence: fraction of each doc's distinct
    3-gram spans that occur in another document (see
    operators/text.py:duplicated_span_stats for the single-join-free plan)."""
    docs = load_table(spark, "documents", sf_dir)
    out = text_ops.duplicated_span_stats(docs)
    return out.select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_duplicated").cast("long").alias("n_duplicated"),
        "dup_ratio",
    )


@register(
    "inverted_index_postings",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
        FROM documents
    ),
    tf AS (SELECT term, doc_id, COUNT(*) AS f FROM tok GROUP BY 1, 2)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(f) AS BIGINT) AS total_tf,
           array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings_head
    FROM tf
    GROUP BY term
    ORDER BY term
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: term → (document frequency, total term
    frequency, ordered posting-list head). The index build is the retrieval
    twin of the word count: one explode → (term, doc) tf aggregate, then a
    term-keyed rollup whose collect_set gathers each term's postings on its
    reducer — partition by term, so posting lists build in parallel and no
    reducer holds more than its terms' lists. Posting heads are capped at
    20 ids to keep the oracle compare bounded; production writes the full
    lists sharded by term hash. The head is emitted as a comma-joined STRING
    (not an array): the driver's canonicalizer sorts the result frame on
    every column, and list-typed cells are unhashable there (r05 red)."""
    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select("doc_id", F.explode(text_ops.tokens_col("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("f").alias("total_tf"),
            F.concat_ws(
                ",",
                F.slice(F.sort_array(F.collect_set("doc_id")), 1, 20).cast(
                    "array<string>"
                ),
            ).alias("postings_head"),
        )
        .orderBy("term")
    )


@register(
    "zipf_fit_report",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk FROM freq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(LN(cnt), LN(rnk)), 4) AS zipf_slope,
           ROUND(regr_r2(LN(cnt), LN(rnk)), 4) AS r2
    FROM ranked
    """,
)
def zipf_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health check: OLS fit of log-frequency vs log-rank over the
    vocabulary. Natural language sits near slope −1 (Zipf); synthetic or
    template-heavy corpora flatten out — a one-number screen for
    "does this crawl look like language". The rank is a vocabulary-sized
    window (vocab ≪ corpus), the fit is Spark's built-in regr_slope/regr_r2
    aggregate — identical math to the DuckDB oracle."""
    docs = load_table(spark, "documents", sf_dir)
    from pyspark.sql.window import Window

    freq = (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = freq.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("tok")))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.round(F.expr("regr_slope(LN(cnt), LN(rnk))"), 4).alias("zipf_slope"),
        F.round(F.expr("regr_r2(LN(cnt), LN(rnk))"), 4).alias("r2"),
    )


@register(
    "dsir_importance_weights",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    b AS (SELECT doc_id, lang,
                 unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                        i -> toks[i] || ' ' || toks[i+1])) AS g
          FROM t),
    tf AS (SELECT doc_id, g, COUNT(*) AS c,
                  MAX(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS is_t
           FROM b GROUP BY doc_id, g),
    vocab AS (SELECT g, SUM(c) AS rc,
                     SUM(CASE WHEN is_t = 1 THEN c ELSE 0 END) AS tc
              FROM tf GROUP BY g),
    tot AS (SELECT CAST(SUM(rc) AS DOUBLE) AS R, CAST(SUM(tc) AS DOUBLE) AS T,
                   CAST(COUNT(*) AS DOUBLE) AS V
            FROM vocab)
    SELECT doc_id,
           ROUND(SUM(c * (LOG2((tc + 1) / (T + V)) - LOG2((rc + 1) / (R + V))))
                 / SUM(c), 4) + 0.0 AS dsir_weight,
           CAST(SUM(c) AS BIGINT) AS n_bigrams
    FROM tf JOIN vocab USING (g) CROSS JOIN tot
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) per-document importance weights under
    hashed-bigram models — target = the corpus's English slice, raw = the
    whole corpus; see operators/text.py:dsir_importance for the plan."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.dsir_importance(docs, target_lang="en")


@register(
    "perplexity_buckets_ccnet",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
                 FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    vocab AS (SELECT tok, SUM(c) AS vc FROM tf GROUP BY 1),
    tot AS (SELECT CAST(SUM(vc) AS DOUBLE) AS n FROM vocab),
    scored AS (SELECT doc_id, ROUND(SUM(c * LOG2(vc / n)) / SUM(c), 4) AS lp,
                      SUM(c) AS n_tokens
               FROM tf JOIN vocab USING (tok) CROSS JOIN tot GROUP BY doc_id),
    lab AS (SELECT s.doc_id, d.lang, s.lp, s.n_tokens,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY s.lp DESC, s.doc_id) AS t
            FROM scored s JOIN documents d USING (doc_id))
    SELECT lang,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           COUNT(*) AS n_docs,
           MIN(lp) AS min_logprob,
           MAX(lp) AS max_logprob,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM lab GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def perplexity_buckets_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail per-language perplexity terciles under
    the corpus's own unigram LM (operators/text.py:perplexity_buckets)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.perplexity_buckets(docs)


@register(
    "curriculum_difficulty_deciles",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len(toks) AS BIGINT)
                   * CAST(len(list_distinct(toks)) AS BIGINT) AS difficulty
          FROM t),
    n AS (SELECT *, ntile(10) OVER (ORDER BY difficulty, doc_id) AS decile FROM d)
    SELECT decile, COUNT(*) AS n_docs,
           MIN(difficulty) AS min_difficulty,
           MAX(difficulty) AS max_difficulty,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) AS avg_tokens
    FROM n GROUP BY 1 ORDER BY 1
    """,
)
def curriculum_difficulty_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact difficulty deciles (token count x distinct tokens) for
    curriculum scheduling (operators/text.py:curriculum_difficulty_deciles)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.curriculum_difficulty_deciles(docs)


@register(
    "mixture_epochs_plan",
    oracle="""
    WITH d AS (SELECT source,
                      CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok,
                      (lang = 'en') AS is_t
               FROM documents),
    s AS (SELECT source, SUM(n_tok) AS src_tokens,
                 SUM(CASE WHEN is_t THEN n_tok ELSE 0 END) AS lang_tokens
          FROM d GROUP BY source),
    t AS (SELECT SUM(src_tokens) AS total_tokens, SUM(lang_tokens) AS total_lang
          FROM s)
    SELECT source,
           CAST(src_tokens AS BIGINT) AS src_tokens,
           CAST(lang_tokens AS BIGINT) AS lang_tokens,
           CAST(CASE WHEN total_lang = 0 THEN 0
                     ELSE lang_tokens * 10000 // total_lang END
                AS BIGINT) AS weight_bp,
           CAST(CASE WHEN total_lang = 0 THEN 0
                     ELSE (total_tokens * 2) * (lang_tokens * 10000 // total_lang) // 10000 END
                AS BIGINT) AS planned_tokens,
           CAST(CASE WHEN total_lang = 0 THEN 0
                     ELSE ((total_tokens * 2) * (lang_tokens * 10000 // total_lang) // 10000)
                          * 1000 // src_tokens END
                AS BIGINT) AS epochs_milli
    FROM s CROSS JOIN t ORDER BY source
    """,
)
def mixture_epochs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style static mixture plan in exact BIGINT arithmetic
    (operators/sampling.py:mixture_epochs_plan)."""
    docs = load_table(spark, "documents", sf_dir)
    return sampling.mixture_epochs_plan(docs, budget_multiple=2)


def _bpe_oracle_ctes(merges: int = 8) -> str:
    """Unrolled-CTE SQL twin of bpe_train_merges — the pagerank technique
    applied to BPE (round-7 close of the no_oracle rows): each round is a
    pair-count aggregate + deterministic argmax (cnt DESC, pair ASC) + a
    merge applied via string REPLACE over a space-armored symbol encoding.

    Encoding: a word's symbols are joined as ``' ' || join(syms, '  ')
    || ' '`` — every symbol carries exactly one space on each side, so the
    pattern ``' x  y '`` matches precisely adjacent symbol pairs, and SQL
    REPLACE's simultaneous left-to-right non-overlapping scan reproduces
    the greedy leftmost-first BPE fold exactly (on 'aaa' with rule (a,a):
    '␣a␣␣a␣␣a␣' → '␣aa␣␣a␣' = [aa, a], matching the Spark fold).
    ``[\\s\\S]`` (not '.') char-splits words that contain embedded
    tabs/newlines; the coalesce guards DuckDB's array_to_string([]) → NULL
    on the degenerate empty token."""
    parts = [
        """
    WITH w0 AS (
        SELECT ' ' || coalesce(array_to_string(regexp_extract_all(w, '[\\s\\S]'), '  '), '') || ' ' AS s,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS w
              FROM documents)
        GROUP BY 1
    )"""
    ]
    for r in range(1, merges + 1):
        parts.append(f""",
    p{r} AS (
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
            SELECT freq,
                   unnest(list_transform(range(1, len(syms)),
                                         i -> syms[i] || ' ' || syms[i+1])) AS pair
            FROM (SELECT string_split(trim(s), '  ') AS syms, freq FROM w{r-1})
        ) GROUP BY pair
    ),
    t{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
    w{r} AS (
        SELECT replace(s,
                       ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
                       ' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ') AS s,
               freq
        FROM w{r-1}, t{r}
    )""")
    return "".join(parts)


def _bpe_merge_oracle_sql(merges: int = 8) -> str:
    arms = "\n        UNION ALL\n".join(
        f"""        SELECT CAST({r} AS INT) AS rank, split_part(pair,' ',1) AS "left",
               split_part(pair,' ',2) AS "right", cnt AS pair_count FROM t{r}"""
        for r in range(1, merges + 1)
    )
    return f"""{_bpe_oracle_ctes(merges)}
    SELECT * FROM (
{arms}
    ) ORDER BY rank"""


@register("bpe_merge_table", oracle=_bpe_merge_oracle_sql(8))
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training (8 rounds) over the corpus's word-type
    frequency table. HASH-GATED since round 7: the oracle unrolls all 8
    pair-count→argmax→merge rounds in SQL (see _bpe_oracle_ctes), so the
    full deterministic tie-broken merge sequence is cross-engine verified,
    not just rows-counted; the greedy-fold merge semantics are additionally
    pinned by unit tests (operators/text.py:bpe_train_merges)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.bpe_train_merges(docs, merges=8)


def _logreg_oracle_sql(iterations: int, lr: float) -> str:
    """Unrolled-CTE twin of operators/text.py:quality_logreg_fit (same
    technique as _pagerank_oracle_sql: scalar weight CTE per iteration)."""
    z = "(w0 + w1*x1 + w2*x2 + w3*x3)"
    p = f"1/(1+EXP(-{z}))"
    sw = "['the','a','of','and','is','to','in','that']"
    parts = [f"""
    WITH t AS (SELECT string_split_regex(trim(text), ' +') AS toks, lang
               FROM documents),
    f AS (SELECT LEAST(len(toks), 128) / 128.0 AS x1,
                 len(list_distinct(toks)) / len(toks) AS x2,
                 len(list_filter(toks, tk -> list_contains({sw}, tk)))
                   / len(toks) AS x3,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM t),
    i0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""]
    for k in range(1, iterations + 1):
        parts.append(f""",
    g{k} AS (SELECT AVG({p} - y) AS g0, AVG(({p} - y) * x1) AS g1,
                    AVG(({p} - y) * x2) AS g2, AVG(({p} - y) * x3) AS g3
             FROM f CROSS JOIN i{k-1}),
    i{k} AS (SELECT w0 - {lr} * g0 AS w0, w1 - {lr} * g1 AS w1,
                    w2 - {lr} * g2 AS w2, w3 - {lr} * g3 AS w3
             FROM i{k-1} CROSS JOIN g{k})""")
    parts.append(f"""
    SELECT CAST({iterations} AS INT) AS iterations,
           ROUND(w0, 4) + 0.0 AS w0, ROUND(w1, 4) + 0.0 AS w1,
           ROUND(w2, 4) + 0.0 AS w2, ROUND(w3, 4) + 0.0 AS w3,
           (SELECT ROUND(AVG(-(y * LN(pp) + (1 - y) * LN(1 - pp))), 4) + 0.0
            FROM (SELECT y, {p} AS pp FROM f CROSS JOIN i{iterations}) q)
               AS log_loss
    FROM i{iterations}
    """)
    return "".join(parts)


@register("quality_logreg_fit", oracle=_logreg_oracle_sql(5, 1.0))
def quality_logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-batch GD for a fastText-style quality/language
    classifier: 5 iterations, each one corpus-wide gradient aggregate and a
    1-row driver pull; oracle is the unrolled-CTE twin
    (operators/text.py:quality_logreg_fit)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.quality_logreg_fit(docs, iterations=5, lr=1.0)


def _bpe_encode_oracle_sql(merges: int = 8) -> str:
    """Full SQL twin of bpe_encode_stats: train the 8 merge rules with the
    unrolled CTEs, then ENCODE every distinct word type by replaying the
    learned replaces in rank order and roll up per-language fertility."""
    enc = []
    for r in range(1, merges + 1):
        # LEFT JOIN ON TRUE (not a comma cross join): if the corpus
        # exhausts mergeable pairs before round r, t{r} is EMPTY and a
        # cross join would empty the whole encode chain — Spark's trainer
        # breaks early but still encodes with the rules it learned, so the
        # oracle must pass rows through unmerged when t{r} has no row.
        enc.append(f""",
    enc{r} AS (
        SELECT tok,
               CASE WHEN pair IS NULL THEN s
                    ELSE replace(s,
                                 ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
                                 ' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ')
               END AS s
        FROM enc{r-1} LEFT JOIN t{r} ON TRUE
    )""")
    return f"""{_bpe_oracle_ctes(merges)},
    tl AS (
        SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS tok
              FROM documents)
        GROUP BY 1, 2
    ),
    enc0 AS (
        SELECT tok,
               ' ' || coalesce(array_to_string(regexp_extract_all(tok, '[\\s\\S]'), '  '), '') || ' ' AS s
        FROM (SELECT DISTINCT tok FROM tl)
    ){"".join(enc)},
    bl AS (SELECT tok, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS bpe_len
           FROM enc{merges})
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS ws_tokens,
           CAST(SUM(cnt * bpe_len) AS BIGINT) AS bpe_tokens,
           CAST(SUM(cnt * length(tok)) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(cnt * bpe_len) AS DOUBLE) / SUM(cnt), 4) AS symbols_per_word
    FROM tl JOIN bl USING (tok)
    GROUP BY lang ORDER BY lang"""


@register("bpe_encode_stats", oracle=_bpe_encode_oracle_sql(8))
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility under the corpus's own learned BPE (8 merges):
    per-language whitespace-token / BPE-symbol / character counts and
    symbols-per-word. HASH-GATED since round 7: the oracle unrolls the
    whole train+encode pipeline in SQL (_bpe_encode_oracle_sql), so the
    fertility numbers are cross-engine verified end-to-end; the merge-fold
    semantics are additionally reference-pinned in tests
    (operators/text.py:bpe_encode_stats)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.bpe_encode_stats(docs, merges=8)
