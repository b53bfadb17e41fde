from dropbox_duckdb_playground_spark.er.resolution import resolve_entities

__all__ = ["resolve_entities"]
