"""SparkSession factory.

One session replaces the reference's DuckDB connection + paradag thread
pool + fsspec storage (reference: batch_framework/rdb.py:83-95,
batch_framework/etl.py:248-265). Temp views are the namespace, Catalyst
is the optimizer, Parquet directories are persistence.

Scale notes (100 TB design): the settings below are profile-driven.
`local` profiles pin shuffle partitions ≈ cores; a cluster deploy leaves
`spark.sql.shuffle.partitions` to AQE coalescing and instead sets an
initial partition number sized by input bytes / 128MB. AQE is always on:
it re-plans skewed joins and converts sort-merge→broadcast at runtime,
which is exactly the decision DuckDB's optimizer made per-query in the
reference.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime re-planning (skew-join split, smj->broadcast, partition
    # coalescing). At 100 TB this is the main defence against skewed keys.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas-UDF / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamps vs the DuckDB oracle (duckdb is UTC-naive).
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: match DuckDB's permissive casts in the reference SQL.
    "spark.sql.ansi.enabled": "false",
    # 128 MB split targets — the right granularity for large parquet scans.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: dimension tables (region/nation/mappers) are
    # small even at sf=100TB fact scale; 64 MB keeps them map-side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def get_spark(
    app_name: str = "dropbox_duckdb_playground_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so tests and bench share one code path; on a real cluster pass
    ``master=None`` with ``spark.master`` preset in spark-submit.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # local mode: driver is the only JVM — give it the memory.
    if master.startswith("local"):
        conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def clear_persisted(spark: SparkSession) -> int:
    """Unpersist every cached/localCheckpointed RDD in the context.

    Operators materialize intermediates with localCheckpoint (self-join
    inputs, iteration state); across a long session those blocks
    accumulate and pressure the block manager / GC. Harness code (bench,
    batch runners) calls this between independent queries. Returns the
    number of RDDs released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    rdds = list(jmap.values())
    for jrdd in rdds:
        jrdd.unpersist(False)
    return len(rdds)
