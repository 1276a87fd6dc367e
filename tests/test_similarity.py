"""ANN operators: brute force is the ground truth; LSH/IVF candidates
must rank consistently within their buckets."""

import math

import pytest
from pyspark.sql import functions as F

from borges_spark.operators import similarity as S


def _vec(i, dim=8):
    # deterministic unit-ish vectors on a few directions + noise
    return [math.sin(0.7 * i + d) for d in range(dim)]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _vec(i)) for i in range(80)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    out = S.brute_force_topk(corpus, queries, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert len(rows) == 4
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        # sin-based vectors: i and i+9 are ~2pi*0.7 apart -> very similar
        # top hit must be highly similar
        assert cosines[0] > 0.95


def test_bruteforce_matches_python(spark, emb):
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    got = [r["vec_id"] for r in S.brute_force_topk(corpus, queries, k=5).orderBy("rank").collect()]

    q = _vec(0)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    want = sorted(range(3, 80), key=lambda i: (-round(cos(q, _vec(i)), 6), i))[:5]
    assert got == want


def test_lsh_bucket_consistency(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    out = S.lsh_bucketed_topk(corpus, queries, k=4, n_planes=4).collect()
    assert len(out) > 0
    # every returned candidate shares the query's bucket by construction
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in corpus.select(
            "vec_id", S.hyperplane_bucket_col(F.col("embedding"), 4).alias("bucket")
        ).collect()
    }
    for r in out:
        assert buckets[r["vec_id"]] == r["bucket"]


def test_ivf_probe(spark, emb):
    centroids = spark.createDataFrame(
        [(0, _vec(0)), (1, _vec(2)), (2, _vec(4))],
        "centroid_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 2)
    out = S.ivf_style_topk(corpus, queries, centroids, k=3, n_probe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
