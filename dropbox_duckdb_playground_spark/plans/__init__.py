from dropbox_duckdb_playground_spark.plans.pipeline import (
    Pipeline,
    PyNode,
    SQLNode,
    ValidateLinkIds,
)

__all__ = ["Pipeline", "PyNode", "SQLNode", "ValidateLinkIds"]
