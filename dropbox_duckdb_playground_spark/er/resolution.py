"""End-to-end entity-resolution dataflow (SURVEY §2.10).

Mirrors the reference pipeline `CanonMatcher → MessyMatcher →
MappingCombiner → IDConvertor` (examples/graph/resolution/main.py:17-91)
with the self-contained expression scorer by default:

1. canon matching (E2/E3): messy records vs a canonical table — block
   join for candidates, score, threshold (0.25), argmax per messy_id →
   mapper (messy_id → canon_id).
2. messy dedup (E4-E7): unmatched messy records blocked against each
   other, scored, threshold (0.5), connected components → cluster mapper.
3. combine (E8) and convert (E9).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.er.blocking import block_table, candidate_pairs
from dropbox_duckdb_playground_spark.er.clustering import cluster_pairs
from dropbox_duckdb_playground_spark.er.features import engineer_features
from dropbox_duckdb_playground_spark.er.scoring import expression_scorer, select_matches
from dropbox_duckdb_playground_spark.operators.relational import (
    anti_diff,
    argmax_per_group,
    union_all,
)


def match_to_canon(
    messy_features: DataFrame,
    canon_features: DataFrame,
    fields: Sequence[str],
    scorer: Callable[[DataFrame], DataFrame] | None = None,
    threshold: float = 0.25,
) -> DataFrame:
    """E2 `CanonMatcher.Pairer` (Gazetteer-style): candidates via shared
    block keys across the two tables, argmax match per messy_id above
    threshold. Output: (messy_id, canon_id, score)."""
    scorer = scorer or expression_scorer(fields)
    mb = block_table(messy_features, fields)
    cb = block_table(canon_features, fields)
    pairs = (
        mb.alias("m")
        .join(cb.alias("c"), "block_key")
        .select(
            F.col("m.node_id").alias("a_id"), F.col("c.node_id").alias("b_id")
        )
        .distinct()
    )
    fa = messy_features.select(
        F.col("node_id").alias("a_id"),
        *[F.col(c).alias(f"a_{c}") for c in messy_features.columns if c != "node_id"],
    )
    fb = canon_features.select(
        F.col("node_id").alias("b_id"),
        *[F.col(c).alias(f"b_{c}") for c in canon_features.columns if c != "node_id"],
    )
    scored = scorer(pairs.join(fa, "a_id").join(fb, "b_id"))
    best = argmax_per_group(
        scored.filter(F.col("score") > threshold).select("a_id", "b_id", "score"),
        keys=["a_id"],
        score="score",
        tiebreak=["b_id"],
    )
    return best.select(
        F.col("a_id").alias("messy_id"), F.col("b_id").alias("canon_id"), "score"
    )


def incremental_match_to_canon(
    messy_features: DataFrame,
    canon_features: DataFrame,
    feedback: DataFrame,
    prev_messy_ids: DataFrame,
    prev_canon_ids: DataFrame,
    fields: Sequence[str],
    scorer: Callable[[DataFrame], DataFrame] | None = None,
    threshold: float = 0.25,
) -> DataFrame:
    """E3 incremental canon pairing (reference `CanonMatcher.Pairer`
    cache branch, examples/graph/resolution/mapper/canon.py:115-166).

    Instead of re-pairing the full messy×canon space each crawl, split
    both sides into old (seen last run — ``prev_*_ids``, one ``node_id``
    column each) and new, pair only the three combinations that can
    produce unseen matches — old×new, new×old, new×new — union with the
    cached ``feedback`` match table (which already holds the old×old
    argmax), and take the global per-messy argmax. With deterministic
    scoring and tiebreaks this equals a full recompute whenever ids are
    only ADDED; if a canon id was removed, its stale feedback matches
    survive (same as the reference) — drop them from ``feedback``
    upstream and re-pair those messy ids if removal must be handled.

    Scale: the pairing cost per crawl is proportional to the *delta*
    blocks, not the corpus; ``prev_*_ids`` are key-only tables (broadcast
    when small) and every sub-pairing reuses the blocked-join path of
    :func:`match_to_canon`.
    """
    scorer = scorer or expression_scorer(fields)
    old_messy = messy_features.join(F.broadcast(prev_messy_ids), "node_id", "semi")
    new_messy = anti_diff(messy_features, prev_messy_ids, ["node_id"])
    old_canon = canon_features.join(F.broadcast(prev_canon_ids), "node_id", "semi")
    new_canon = anti_diff(canon_features, prev_canon_ids, ["node_id"])

    parts = [feedback.select("messy_id", "canon_id", "score")]
    for m, c in ((old_messy, new_canon), (new_messy, old_canon), (new_messy, new_canon)):
        parts.append(match_to_canon(m, c, fields, scorer=scorer, threshold=threshold))
    return argmax_per_group(
        union_all(parts), keys=["messy_id"], score="score", tiebreak=["canon_id"]
    )


def dedup_messy(
    messy_features: DataFrame,
    fields: Sequence[str],
    scorer: Callable[[DataFrame], DataFrame] | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """E4-E7: block → pair → score → threshold → weak components.
    Output: (messy_id, cluster_id)."""
    scorer = scorer or expression_scorer(fields)
    blocks = block_table(messy_features, fields)
    pairs = candidate_pairs(blocks, messy_features)
    matches = select_matches(scorer(pairs), threshold=threshold)
    return cluster_pairs(matches)


def resolve_entities(
    messy: DataFrame,
    canon: DataFrame | None,
    fields: Sequence[str] | None = None,
    id_col: str = "node_id",
    name_col: str = "name",
    canon_threshold: float = 0.25,
    messy_threshold: float = 0.5,
) -> DataFrame:
    """Full resolution: returns the combined mapper (messy_id, new_id)
    where new_id is the canon match when present, else the dedup cluster
    id, else absent (identity handled by `convert_ids`' COALESCE)."""
    mf = engineer_features(messy, id_col=id_col, name_col=name_col)
    if fields is None:
        fields = [c for c in mf.columns if c != "node_id"]
    mappers: list[DataFrame] = []
    unmatched = mf
    if canon is not None:
        cf = engineer_features(canon, id_col=id_col, name_col=name_col)
        canon_map = match_to_canon(mf, cf, fields, threshold=canon_threshold)
        mappers.append(
            canon_map.select("messy_id", F.col("canon_id").alias("new_id"))
        )
        unmatched = mf.join(canon_map.select("messy_id"),
                            mf.node_id == F.col("messy_id"), "left_anti")
    cluster_map = dedup_messy(unmatched, fields, threshold=messy_threshold)
    mappers.append(cluster_map.select("messy_id", F.col("cluster_id").alias("new_id")))
    from dropbox_duckdb_playground_spark.er.clustering import combine_mappings

    return combine_mappings(mappers)


def validate_entity_map(
    features: DataFrame,
    entity_map: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "node_id",
) -> dict[str, int]:
    """V4: id-consistency diagnostics across the feature / entity-map /
    candidate-pair tables (reference `MessyEntityMapValidate`,
    examples/graph/resolution/mapper/messy.py:253-282). Join-based count
    checks — each is one left_anti aggregate, nothing collected:

    - ``unmapped``: feature ids with no entity-map row,
    - ``orphan_mapped``: entity-map ids absent from the features,
    - ``orphan_paired``: pair endpoints absent from the features.
    """
    feat_ids = features.select(F.col(id_col).alias("messy_id"))
    mapped = entity_map.select("messy_id")
    out = {
        "unmapped": feat_ids.join(mapped, "messy_id", "left_anti").count(),
        "orphan_mapped": mapped.join(feat_ids, "messy_id", "left_anti").count(),
    }
    if pairs is not None:
        ends = pairs.select(F.col("a_id").alias("messy_id")).union(
            pairs.select(F.col("b_id").alias("messy_id"))
        )
        out["orphan_paired"] = ends.join(feat_ids, "messy_id", "left_anti").count()
    return out
