from dropbox_duckdb_playground_spark.operators.relational import (
    anti_diff,
    argmax_per_group,
    distinct_on,
    keep_first_merge,
    multi_left_join,
    profile_columns,
    salted_join,
    stable_id,
)

__all__ = [
    "anti_diff",
    "argmax_per_group",
    "distinct_on",
    "keep_first_merge",
    "multi_left_join",
    "profile_columns",
    "salted_join",
    "stable_id",
]
