"""ER clustering (E7) + mapper combination (E8) + id conversion (E9)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.operators.components import (
    connected_components,
)
from dropbox_duckdb_playground_spark.operators.relational import stable_id, union_all

CLUSTER_SALT = "cluster*id*v1*"


def cluster_pairs(pairs: DataFrame) -> DataFrame:
    """Weak connected components over scored pairs → (messy_id, cluster_id).

    cluster_id replicates the reference's salted hash of the cluster
    label (mapper/messy.py:445-448) via xxhash64(salt || min-member-id) —
    stable across runs, engine-internal (SURVEY §8.1)."""
    cc = connected_components(pairs, src="from_id", dst="to_id")
    return cc.select(
        F.col("node_id").alias("messy_id"),
        stable_id(F.col("cluster_id").cast("string"), salt=CLUSTER_SALT).alias(
            "cluster_id"
        ),
    )


def combine_mappings(mappers: Sequence[DataFrame]) -> DataFrame:
    """E8 `MappingCombiner` (resolution/main.py:210-244): UNION ALL of
    (messy_id, new_id) mappers with earlier-mapper precedence — rank-1
    per messy_id over (mapper position, new_id), so overlapping mappers
    resolve deterministically (canon matches first by convention) rather
    than by dropDuplicates' arbitrary row choice."""
    from pyspark.sql import Window

    tagged = [
        m.select("messy_id", "new_id", F.lit(i).alias("__prio__"))
        for i, m in enumerate(mappers)
    ]
    w = Window.partitionBy("messy_id").orderBy(F.asc("__prio__"), F.asc("new_id"))
    return (
        union_all(tagged)
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("messy_id", "new_id")
    )


def convert_ids(
    table: DataFrame,
    mapper: DataFrame,
    id_cols: Sequence[str],
) -> DataFrame:
    """E9 `IDConvertor` (resolution/convertor.py:17-115): rewrite each id
    column through the mapper; unmatched ids pass through (J3 left join +
    COALESCE). Mapper is broadcast — it's the small side by construction."""
    out = table
    for col in id_cols:
        m = mapper.select(
            F.col("messy_id").alias(f"__m_{col}"),
            F.col("new_id").alias(f"__n_{col}"),
        )
        out = (
            out.join(F.broadcast(m), out[col] == m[f"__m_{col}"], "left")
            .withColumn(col, F.coalesce(F.col(f"__n_{col}"), F.col(col)))
            .drop(f"__m_{col}", f"__n_{col}")
        )
    return out
