"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a crossJoin of a *small broadcast
query set* against the corpus (never corpus x corpus), ranked by a
per-query window. Scale path: random-hyperplane LSH bucketing — probe
only the query's bucket(s), turning the scan into an equi-join.

Hyperplanes are deterministic (component h[p][d] = sin((p+1)*(d+1)))
so the Spark plan and the DuckDB oracle agree bit-for-bit without
shipping a weights file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from borges_spark.operators.dedup import cosine_sim_col

N_HYPERPLANES = 8


def _dot_col(a: Column, b: Column) -> Column:
    """The dot-product fold of cosine_sim_col, verbatim."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm_col(a: Column) -> Column:
    """The norm fold of cosine_sim_col, verbatim — precomputable once
    per row so the per-pair expression shrinks to the dot product."""
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries must be small (broadcast):
    plan = broadcast-nested-loop of |Q| x |corpus|, then per-query
    window top-k — the right baseline when |Q| << |corpus|."""
    # r6: each side's norm is computed ONCE per row before the cross
    # join instead of once per (query, corpus) pair — the norm fold was
    # 2/3 of the interpreted per-pair work, and the expression (hence
    # the resulting double) is unchanged (guide §1.2 per-task work)
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("q_norm", _norm_col(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("c_vec")
    ).withColumn("c_norm", _norm_col(F.col("c_vec")))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        F.round(
            _dot_col(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
            6,
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hyperplane_bucket_col(vec: Column, n_planes: int = N_HYPERPLANES) -> Column:
    """Sign-of-dot-product LSH bucket id (0..2^n_planes-1), built from
    deterministic pseudo-hyperplanes — pure column algebra, JVM-side."""
    v = vec.cast("array<double>")
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))

    def plane_bit(p: Column) -> Column:
        # dot(v, h_p) with h_p[d] = sin((p+1)*(d+1))
        dims = F.sequence(F.lit(0), F.size(v) - 1)
        dot = F.aggregate(
            F.zip_with(v, dims, lambda x, d: x * F.sin((p + 1).cast("double") * (d + 1).cast("double"))),
            F.lit(0.0),
            lambda s, t: s + t,
        )
        # 2^p via pow (exact in double for p <= 50; n_planes is small)
        return F.when(dot > 0, F.pow(F.lit(2.0), p.cast("double"))).otherwise(F.lit(0.0))

    return F.aggregate(F.transform(planes, plane_bit), F.lit(0.0), lambda s, b: s + b).cast("int")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket (equi-join on bucket), exact cosine rank within. At corpus
    scale the bucket column is precomputed/persisted and the join is
    a shuffle on a 2^n_planes-ary key instead of a full scan."""
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
        hyperplane_bucket_col(F.col(vec_col), n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
        hyperplane_bucket_col(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", F.round(cosine_sim_col(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank", "bucket")
    )


def ivf_style_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF-style ANN: assign corpus vectors to their nearest centroid
    (broadcast centroid table), probe the n_probe nearest centroid lists
    per query. All joins are equi-joins on centroid id."""
    cts = centroids.select(
        F.col(centroid_id_col), F.col(vec_col).cast("array<double>").alias("ct_vec")
    )

    def assign(df: DataFrame, idc: str, keep_n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cts)).withColumn(
            "ct_sim", cosine_sim_col(F.col("_v"), F.col("ct_vec"))
        )
        w = Window.partitionBy(idc).orderBy(F.col("ct_sim").desc(), F.col(centroid_id_col).asc())
        return (
            scored.withColumn("ct_rank", F.row_number().over(w))
            .filter(F.col("ct_rank") <= keep_n)
            .drop("ct_vec", "ct_sim", "ct_rank")
        )

    c = assign(
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")), id_col, 1
    ).withColumnRenamed("_v", "c_vec")
    q = assign(
        queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_v")),
        query_id_col,
        n_probe,
    ).withColumnRenamed("_v", "q_vec")

    scored = c.join(F.broadcast(q), centroid_id_col).withColumn(
        "cosine", F.round(cosine_sim_col(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
