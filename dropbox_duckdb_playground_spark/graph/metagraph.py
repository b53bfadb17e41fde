"""Property-graph metadata layer — the reference's `MetaGraph`
(examples/graph/metagraph.py:27-64, examples/meta.py:3-11) re-expressed
engine-agnostically.

A MetaGraph is a dict of triplets ``link -> (src_node, dst_node)``.
From it the reference generates:
- per-subgraph extraction SQL (node_sqls / link_sqls, examples/meta.py:56-247)
- grouping SQL: for every node that appears in several subgraphs, the
  union of its id population LEFT JOINed with each subgraph's property
  table (examples/graph/group/meta.py:9-68) — J1/J2/U1 shapes
- validators for every triplet (examples/graph/subgraph/validate.py:29-45)

Here the extraction SQL stays user-supplied (it is workload-specific);
the *grouping* and *validation* machinery is generic and generated.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.engine import Engine
from dropbox_duckdb_playground_spark.operators.relational import (
    multi_left_join,
    union_distinct,
)
from dropbox_duckdb_playground_spark.plans.pipeline import Node, ValidateLinkIds


@dataclass
class MetaGraph:
    """``triplets``: link name -> (src node name, dst node name).
    ``node_grouping``: node name -> the subgraph table ids holding its
    rows (reference `metagraph.grouping`, examples/meta.py:249-259)."""

    triplets: Mapping[str, tuple[str, str]]
    node_grouping: Mapping[str, Sequence[str]] = field(default_factory=dict)
    link_grouping: Mapping[str, Sequence[str]] = field(default_factory=dict)

    @property
    def nodes(self) -> list[str]:
        out: list[str] = []
        for src, dst in self.triplets.values():
            for n in (src, dst):
                if n not in out:
                    out.append(n)
        return out

    @property
    def links(self) -> list[str]:
        return list(self.triplets)

    # -- grouping (reference examples/graph/group/meta.py:9-68) ------------
    def group_nodes(self, engine: Engine, node: str) -> DataFrame:
        """Union the node-id population across subgraph tables, then LEFT
        JOIN each table's properties back on node_id (J1 + U1).

        Scale: the id population and each property table share the
        node_id hash partitioning; property tables that are small get
        broadcast by AQE."""
        sources = self.node_grouping.get(node, [node])
        tables = [engine.table(t) for t in sources]
        population = union_distinct(
            [t.select("node_id") for t in tables]
        )
        props = []
        for src_name, t in zip(sources, tables):
            others = [c for c in t.columns if c != "node_id"]
            props.append(
                t.select(
                    "node_id",
                    *[F.col(c).alias(f"{src_name}__{c}") for c in others],
                )
            )
        joined = multi_left_join(population, props, on=["node_id"])
        # coalesce same-suffix property columns across sources (F3 shape)
        out_cols: dict[str, list[str]] = {}
        for src_name, t in zip(sources, tables):
            for c in t.columns:
                if c != "node_id":
                    out_cols.setdefault(c, []).append(f"{src_name}__{c}")
        final = [F.col("node_id")]
        for c, variants in out_cols.items():
            final.append(F.coalesce(*[F.col(v) for v in variants]).alias(c))
        return joined.select(*final)

    def group_links(self, engine: Engine, link: str) -> DataFrame:
        """Two-key variant (J2): union (from_id, to_id) pairs, LEFT JOIN
        per-source link properties on both keys."""
        sources = self.link_grouping.get(link, [link])
        tables = [engine.table(t) for t in sources]
        population = union_distinct(
            [t.select("from_id", "to_id") for t in tables]
        )
        props = []
        for src_name, t in zip(sources, tables):
            others = [c for c in t.columns if c not in ("from_id", "to_id")]
            if others:
                props.append(
                    t.select(
                        "from_id",
                        "to_id",
                        *[F.col(c).alias(f"{src_name}__{c}") for c in others],
                    )
                )
        joined = multi_left_join(population, props, on=["from_id", "to_id"])
        out_cols: dict[str, list[str]] = {}
        for src_name, t in zip(sources, tables):
            for c in t.columns:
                if c not in ("from_id", "to_id"):
                    out_cols.setdefault(c, []).append(f"{src_name}__{c}")
        final = [F.col("from_id"), F.col("to_id")]
        for c, variants in out_cols.items():
            final.append(F.coalesce(*[F.col(v) for v in variants]).alias(c))
        return joined.select(*final)

    # -- validators (reference examples/graph/subgraph/validate.py:29-45) --
    def validators(self) -> list[Node]:
        """One `ValidateLinkIds` per triplet: from_id ⊆ src node ids,
        to_id ⊆ dst node ids."""
        out: list[Node] = []
        for link, (src, dst) in self.triplets.items():
            out.append(
                ValidateLinkIds(link_id=link, node_id=src, fks=["from_id"])
            )
            out.append(
                ValidateLinkIds(link_id=link, node_id=dst, fks=["to_id"])
            )
        return out
