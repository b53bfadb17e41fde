from dropbox_duckdb_playground_spark.sql.dialect import translate

__all__ = ["translate"]
