from dropbox_duckdb_playground_spark.streaming.incremental import IncrementalCache

__all__ = ["IncrementalCache"]
