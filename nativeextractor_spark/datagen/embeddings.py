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
