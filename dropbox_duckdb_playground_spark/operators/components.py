"""Weak connected components on an edge DataFrame — dependency-free.

Replaces the reference's driver-memory igraph clustering
(reference: examples/graph/resolution/mapper/messy.py:431-433) with a
distributed alternating min-label propagation loop (the "large-star /
small-star" family; converges in O(log n) rounds on real graphs, and ER
cluster graphs have tiny diameter so typically 2-4 rounds).

Scale notes: each round is one join + one groupBy, both hash-partitioned
on the node id — Catalyst reuses the partitioning across rounds. Labels
are persisted per round and the lineage is cut (localCheckpoint) so the
plan doesn't grow unboundedly. Convergence is detected with a cheap
count of changed labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Weak connected components. Returns (node_id, cluster_id) where
    cluster_id = min node id reachable in the undirected graph.

    Edges are treated as undirected (both directions unioned — SURVEY
    §8.4); isolated self-edges yield singleton clusters."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # label <- min(own, min over neighbors) iterated to fixpoint
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und.b == labels.node)
            .select(F.col("a").alias("node"), F.col("label"))
        )
        new_labels = (
            labels.select("node", "label")
            .union(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("node_id"), F.col("label").alias("cluster_id")
    )
