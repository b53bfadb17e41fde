"""Weak connected components on an edge DataFrame — dependency-free.

Replaces the reference's driver-memory igraph clustering
(reference: examples/graph/resolution/mapper/messy.py:431-433) with a
distributed min-label propagation loop plus pointer jumping (path
halving). Neighbor propagation moves labels one hop per round; the
pointer-jump step (label <- label(label)) doubles resolved path lengths,
so convergence is O(log diameter) rounds even on long chains/cycles —
ER cluster graphs (tiny diameter) converge in 2-3 rounds.

Scale notes: each round is two joins + one groupBy, all hash-partitioned
on the node id; labels are persisted per round and lineage is cut
(localCheckpoint) so the plan doesn't grow unboundedly. Convergence is
detected by counting changed labels on the already-checkpointed result —
a cheap local scan, not a plan re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.operators.relational import fan_out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Weak connected components. Returns (node_id, cluster_id) where
    cluster_id = min node id reachable in the undirected graph.

    Edges are treated as undirected (both directions unioned — SURVEY
    §8.4); self-edges yield singleton clusters."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        fan_out(e)
        .union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # 1-hop: min label over self ∪ neighbors
        neigh = und.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        hop = (
            labels.union(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label <- label(label)  (path halving)
        parent = hop.select(
            F.col("node").alias("label"), F.col("label").alias("plabel")
        )
        new_labels = (
            hop.join(parent, "label", "left")
            .select("node", F.coalesce("plabel", "label").alias("label"))
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
