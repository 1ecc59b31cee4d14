"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side arithmetic via
``aggregate``/``zip_with`` in DOUBLE for cross-engine determinism); the scale
path buckets vectors with deterministic random-hyperplane LSH so each query
only scans its bucket neighborhood.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries: (query_id, embedding). Small query sets broadcast; the corpus is
    scanned once (crossJoin + window top-k, AQE-coalesced). Returns
    (query_id, vec_id, cosine, rank). Self-matches are not excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    sim = (
        v.crossJoin(q)
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_v"), F.col("_qv"))
                / (_norm(F.col("_v")) * _norm(F.col("_qv"))),
                6,
            ),
        )
        .drop("_v", "_qv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets, candidates share a
    bucket with the query, exact cosine re-rank inside the bucket.

    At scale the bucket join replaces the full scan (2^n_planes buckets); the
    hyperplane matrix is a broadcast literal. Recall is tunable via n_planes.
    Returns (query_id, vec_id, cosine, rank).
    """
    planes = _hyperplanes(dim, n_planes, seed)

    def bucket_expr(col):
        bits = []
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(
                    col,
                    F.array(*[F.lit(float(x)) for x in planes[p]]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            bucket_expr(F.col(vec_col)).alias("bucket"),
        )
    )
    sim = (
        v.join(q, "bucket")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_v"), F.col("_qv"))
                / (_norm(F.col("_v")) * _norm(F.col("_qv"))),
                6,
            ),
        )
        .drop("_v", "_qv", "bucket")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via IVF coarse quantization: assign every vector to
    its nearest centroid cell, probe only each query's ``nprobe`` nearest
    cells, exact cosine re-rank inside them.

    The coarse codebook here is a deterministic seed set (the
    ``n_centroids`` lowest-id vectors) so the result is oracle-checkable; a
    production build would train it with k-means — the Spark plan is
    identical either way: centroids broadcast to the assignment scan (one
    pass, no shuffle of the corpus), then a cell-equi-join replaces the full
    scan. Returns (query_id, vec_id, cosine, rank).
    """
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    cents = F.broadcast(
        vectors.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("_c")
        )
    )

    def nearest_cells(df, id_name, vec, keep):
        sim = df.crossJoin(cents).withColumn(
            "_csim",
            F.round(
                _dot(F.col(vec), F.col("_c"))
                / (_norm(F.col(vec)) * _norm(F.col("_c"))),
                6,
            ),
        )
        w = Window.partitionBy(id_name).orderBy(
            F.desc("_csim"), F.asc("cent_id")
        )
        return (
            sim.withColumn("_crank", F.row_number().over(w))
            .where(F.col("_crank") <= keep)
            .drop("_c", "_csim", "_crank")
        )

    assigned = nearest_cells(v, "vec_id", "_v", 1).withColumnRenamed(
        "cent_id", "cell"
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    probes = nearest_cells(q, "query_id", "_qv", nprobe).withColumnRenamed(
        "cent_id", "cell"
    )
    sim = (
        assigned.join(probes, "cell")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_v"), F.col("_qv"))
                / (_norm(F.col("_v")) * _norm(F.col("_qv"))),
                6,
            ),
        )
        .drop("_v", "_qv", "cell")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_duplicate_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: vectors sharing a
    random-hyperplane sign bucket, verified with exact cosine ≥ threshold.

    The bucketed self-join replaces the all-pairs cross product (near-dups
    almost always share all sign bits); oversized buckets are dropped
    (skew cap). Returns (id_a, id_b, cosine)."""
    planes = _hyperplanes(dim, n_planes, seed)

    def bucket_expr(col):
        bits = []
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(
                    col,
                    F.array(*[F.lit(float(x)) for x in planes[p]]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    ).localCheckpoint(eager=True)
    sizes = v.groupBy("bucket").agg(F.count("*").alias("_sz"))
    bounded = v.join(sizes.where(F.col("_sz") <= max_bucket).drop("_sz"), "bucket")
    a = bounded.select(
        "bucket", F.col("vec_id").alias("id_a"), F.col("_v").alias("_va")
    )
    b = bounded.select(
        "bucket", F.col("vec_id").alias("id_b"), F.col("_v").alias("_vb")
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb"))),
                6,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
