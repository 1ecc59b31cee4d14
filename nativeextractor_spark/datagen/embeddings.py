"""Deterministic clustered embedding fixture (VERDICT r3 item 5).

The driver's ``embeddings.parquet`` is uniform noise — the right corpus
for verifying ANN *plumbing*, but uniform vectors don't cluster, so
recall metrics on them can't demonstrate the tuned behavior a user would
see on real embeddings (r3 measured lsh 0.20 / ivf_kmeans 0.60 there —
the metric working, proving nothing actionable). This module synthesises
a small clustered corpus: unit-norm Gaussian cluster centers plus
per-vector Gaussian noise, every coordinate rounded to 6 decimals so the
exact same doubles can be inlined as SQL literals for the DuckDB oracle
(decimal round-trip is exact at this precision).
"""

from __future__ import annotations

import numpy as np

N_CLUSTERS = 8
PER_CLUSTER = 30
DIM = 16


def clustered_embedding_rows(
    n_clusters: int = N_CLUSTERS,
    per_cluster: int = PER_CLUSTER,
    dim: int = DIM,
    seed: int = 7,
    noise: float = 0.15,
) -> list[tuple[int, list[float]]]:
    """(vec_id, vector) rows; vec_id = cluster * per_cluster + i, so
    ``vec_id % per_cluster == 0`` picks one representative per cluster
    (the fixture's query set). Deterministic: seeded RandomState,
    float64, coordinates rounded to 6 decimals."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.maximum(
        np.sqrt((centers * centers).sum(axis=1))[:, None], 1e-12
    )
    rows: list[tuple[int, list[float]]] = []
    for c in range(n_clusters):
        for i in range(per_cluster):
            v = centers[c] + noise * rng.standard_normal(dim)
            rows.append(
                (c * per_cluster + i, [round(float(x), 6) for x in v])
            )
    return rows


def clustered_embeddings_df(spark, **kw):
    """The fixture as a DataFrame (vec_id long, embedding array<double>)."""
    return spark.createDataFrame(
        clustered_embedding_rows(**kw),
        "vec_id long, embedding array<double>",
    )


def clustered_embeddings_df_dist(
    spark,
    n_clusters: int,
    per_cluster: int,
    dim: int = 32,
    seed: int = 11,
    noise: float = 0.15,
):
    """Distributed variant of :func:`clustered_embeddings_df` for
    million-vector tiers: each CLUSTER is generated on an executor from
    its own derived seed, so the output is deterministic and identical
    under any partitioning (and never materializes Python row lists on
    the driver). Same structure as the driver-side fixture — unit-norm
    Gaussian centers, per-vector Gaussian noise, 6-decimal rounding,
    ``vec_id = cluster * per_cluster + i`` — but the per-cluster RNG
    stream differs from the single-stream fixture, so the two generators
    produce different (equally valid) corpora."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out_ids = []
            out_vecs = []
            for c in pdf["id"]:
                c = int(c)
                rng = np.random.RandomState((seed * 1_000_003 + c) % (2**31))
                center = rng.standard_normal(dim)
                center /= max(float(np.sqrt((center * center).sum())), 1e-12)
                vecs = center + noise * rng.standard_normal((per_cluster, dim))
                vecs = np.round(vecs, 6)
                out_ids.extend(c * per_cluster + i for i in range(per_cluster))
                out_vecs.extend(list(map(float, v)) for v in vecs)
            yield pd.DataFrame({"vec_id": out_ids, "embedding": out_vecs})

    n_parts = max(min(n_clusters, spark.sparkContext.defaultParallelism * 4), 1)
    return (
        spark.range(n_clusters, numPartitions=n_parts)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )
