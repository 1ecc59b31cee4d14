"""Connected components via alternating large-star / small-star joins.

GraphFrames-style iterative DataFrame algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public method):
alternate two rounds until the edge set is a fixpoint; each round is a
groupBy-min + join, so the whole thing is shuffle-bound and converges in
O(log n) rounds. Every round is checkpoint-truncated (``localCheckpoint``)
to keep the plan/lineage from growing exponentially.

Output: (node, component) with component = min node id of the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect neighbors larger than u to min(Γ(u) ∪ {u})."""
    sym = _symmetric(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("_mv"))
    mins = mins.select("u", F.least("u", "_mv").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high→low; connect each low neighbor (and u) to the min."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    grouped = directed.groupBy("u").agg(
        F.min("v").alias("m"), F.collect_set("v").alias("nbrs")
    )
    exploded = grouped.select(
        "u", "m", F.explode(F.array_union("nbrs", F.array("u"))).alias("v")
    )
    return (
        exploded.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """edges(u long, v long) → (node long, component long).

    Isolated nodes (self-loops or u==v rows) are preserved as their own
    component.
    """
    cur = edges.select("u", "v").where(F.col("u") != F.col("v")).distinct()
    singletons = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    def _sig(df: DataFrame) -> tuple:
        # one-job fixpoint signature: both sides are distinct edge sets, so
        # (count, xor-of-hashes) equality is a reliable set-equality check
        # (bit_xor cannot overflow under ANSI mode, unlike sum)
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        return (row.n, row.h)

    cur = cur.localCheckpoint(eager=True)
    cur_sig = _sig(cur)
    for _ in range(max_iterations):
        after_large = _large_star(cur)
        after_small = _small_star(after_large).localCheckpoint(eager=True)
        new_sig = _sig(after_small)
        cur = after_small
        if new_sig == cur_sig:
            break
        cur_sig = new_sig
    # star graph: every non-root points at its component root
    membership = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = singletons.join(
        membership.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return membership.union(roots)
