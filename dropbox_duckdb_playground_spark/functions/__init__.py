"""Scalar-function surface (SURVEY §2.3) — one import point.

The reference's scalar vocabulary (F1-F10) maps to built-in
`pyspark.sql.functions` plus the handful of engine helpers collected
here. Nothing in this namespace is a Python UDF — every helper returns
a Column expression that stays inside whole-stage codegen.

| ref | helper here / built-in |
|---|---|
| F1 `HASH(x)` | :func:`stable_id` (xxhash64) / :func:`portable_id` (md5, engine-portable) |
| F2 `CONCAT(a,'|',b)` | `F.concat_ws` (composite keys feed :func:`stable_id`) |
| F3 `COALESCE` | `F.coalesce` |
| F4 `count(*)` | `F.count("*")` |
| F5/F6 row_number % N | `operators.parallel.add_partition_key` |
| F7 string lambdas | `er.features` (before_whitespace, …) |
| F8 json dumps/loads | `F.to_json` / `F.from_json` |
| F9 salted cluster hash | :func:`stable_id` with ``salt`` |
| F10 dtype→tag map | `sources.redisgraph._type_tag` |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.operators.dedup import _hex60 as _md5_60
from dropbox_duckdb_playground_spark.operators.relational import stable_id
from dropbox_duckdb_playground_spark.operators.similarity import (
    cosine,
    hyperplane_signature,
)

__all__ = [
    "stable_id",
    "portable_id",
    "cosine",
    "hyperplane_signature",
    "composite_key",
]


def portable_id(c: Column | str) -> Column:
    """60-bit id that evaluates to the SAME value in any engine with md5
    (first 15 hex chars → bigint). Used wherever ids must survive a
    cross-engine differential check (SURVEY §8.1); `stable_id` (xxhash64,
    faster, engine-internal) is for join keys that never leave Spark."""
    return _md5_60(F.col(c) if isinstance(c, str) else c)


def composite_key(*cols: Column | str, sep: str = "|") -> Column:
    """F2: the reference's ``CONCAT(a, '|', b)`` composite natural key
    (examples/meta.py:83,164,174)."""
    return F.concat_ws(
        sep, *[F.col(c) if isinstance(c, str) else c for c in cols]
    )
