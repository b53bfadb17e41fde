"""RedisGraph bulk-load typed-CSV sink (S10) — the reference's
`redisgraph.py` exporter (examples/graph/group/redisgraph.py:17-94):
rename columns to the bulk-insert header convention and write CSV.

Header convention (RedisGraph bulk-insert format):
- node id column    -> ``:ID({label})``
- link endpoints    -> ``:START_ID`` / ``:END_ID``
- property columns  -> ``{name}:{TYPE}`` with TYPE from the Spark dtype
  (the reference derives it from pandas dtypes, redisgraph.py:11-14)

Scale: ``coalesce(1)`` only when a single file is demanded by the bulk
loader; otherwise keep one CSV part per partition and feed the loader a
directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SPARK_TO_REDIS = {
    "string": "STRING",
    "bigint": "LONG",
    "int": "LONG",
    "smallint": "LONG",
    "tinyint": "LONG",
    "double": "FLOAT",
    "float": "FLOAT",
    "boolean": "BOOL",
}


def _type_tag(spark_dtype: str) -> str:
    """F10: dtype→RedisGraph tag map over ``df.dtypes`` (reference:
    examples/graph/group/redisgraph.py:11-14)."""
    return _SPARK_TO_REDIS.get(spark_dtype, "STRING")


def redisgraph_node_header(df: DataFrame, label: str, id_col: str = "node_id") -> DataFrame:
    renames = {}
    for name, dtype in df.dtypes:
        if name == id_col:
            renames[name] = f":ID({label})"
        else:
            renames[name] = f"{name}:{_type_tag(dtype)}"
    return df.withColumnsRenamed(renames)


def redisgraph_link_header(
    df: DataFrame, from_col: str = "from_id", to_col: str = "to_id"
) -> DataFrame:
    renames = {}
    for name, dtype in df.dtypes:
        if name == from_col:
            renames[name] = ":START_ID"
        elif name == to_col:
            renames[name] = ":END_ID"
        else:
            renames[name] = f"{name}:{_type_tag(dtype)}"
    return df.withColumnsRenamed(renames)


def write_redisgraph_nodes_csv(
    df: DataFrame, path: str, label: str, id_col: str = "node_id", single_file: bool = True
) -> None:
    out = redisgraph_node_header(df, label, id_col)
    if single_file:
        out = out.coalesce(1)
    # quoteAll mirrors the reference's QUOTE_NONNUMERIC for string safety
    out.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(path)


def write_redisgraph_links_csv(
    df: DataFrame,
    path: str,
    from_col: str = "from_id",
    to_col: str = "to_id",
    single_file: bool = True,
) -> None:
    out = redisgraph_link_header(df, from_col, to_col)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(path)
