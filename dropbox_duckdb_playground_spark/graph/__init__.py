from dropbox_duckdb_playground_spark.graph.metagraph import MetaGraph

__all__ = ["MetaGraph"]
