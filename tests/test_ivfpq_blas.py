"""BLAS-kernel vs Catalyst-columnar agreement for the IVF-PQ family.

Round-7 promotion (VERDICT r6 'What's wrong' #2 / SCALING.md:618): the
``mapInPandas`` BLAS kernels are now the default ``ivfpq_topk`` /
``pq_distortion``; the column-expression paths survive as
``*_columnar`` purely so this engine-side diff can assert the two
implementations agree bit-for-bit on real data — the same guarantee the
DuckDB oracle provides, but checked inside one Spark session with zero
tolerance (exact row equality including the 4dp/6dp-rounded values and
integer micro-unit sums).
"""

import os

import pytest

from kafkasparkstream_spark.operators import similarity
from kafkasparkstream_spark.queries import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR)


def test_ivfpq_blas_matches_columnar(spark, emb):
    blas = _rows(similarity.ivfpq_topk(emb))
    col = _rows(similarity.ivfpq_topk_columnar(emb))
    assert blas == col
    assert len(blas) == 10 * 10


def test_ivfpq_blas_matches_columnar_deep_shortlist(spark, emb):
    # the rerank path consumes ivfpq_topk at shortlist depth 50 —
    # agreement must hold past the top-10 horizon too
    blas = _rows(similarity.ivfpq_topk(emb, k=50))
    col = _rows(similarity.ivfpq_topk_columnar(emb, k=50))
    assert blas == col


def test_pq_distortion_blas_matches_columnar(spark, emb):
    blas = _rows(similarity.pq_distortion(emb))
    col = _rows(similarity.pq_distortion_columnar(emb))
    assert blas == col
    # exact integer rollup: totals must cover every (row, subspace) once
    assert sum(r[2] for r in blas) == emb.count() * 4


def test_spark_round_matches_spark_semantics(spark):
    """_spark_round must reproduce Spark's Round on doubles — including
    the shortest-repr HALF_UP cases the naive floor(+0.5) fast path gets
    wrong (e.g. 0.1234565 is stored below the half boundary but its repr
    ends in 5, so the JVM rounds it UP)."""
    import numpy as np

    from pyspark.sql import functions as F

    vals = [
        0.1234565,          # repr-vs-binary divergence case
        -0.1234565,
        2.5e-6, -2.5e-6,    # exact representable boundary behavior
        1.0000005, 0.0, 123456.789,
        0.9999995, -0.9999995,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    jvm = [r[0] for r in df.select(F.round("x", 6).alias("r")).collect()]
    ours = list(similarity._spark_round(np.array(vals), 6))
    assert ours == jvm
