from dropbox_duckdb_playground_spark.streaming.incremental import (
    IncrementalCache,
    finalize_agg,
    incremental_agg_state,
    merge_agg_states,
)

__all__ = [
    "IncrementalCache",
    "finalize_agg",
    "incremental_agg_state",
    "merge_agg_states",
]
