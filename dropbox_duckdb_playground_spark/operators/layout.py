"""Physical file-layout management: compaction and clustered writes.

The reference never needed these — its tables were single Parquet files
on Dropbox (reference: batch_framework/storage.py:134-155). A Spark
engine writing with hundreds of tasks does: every incremental batch
appends task-count files, and at 100 TB the small-files problem is a
double failure — driver-side listing of millions of objects, and one
scan task per tiny file. The two operators here are the standard
remedies:

- :func:`compact` — rewrite a Parquet directory into
  ``ceil(bytes / target_file_mb)`` files.
- :func:`clustered_write` — range-partition on the clustering columns
  and sort within partitions before writing, so Parquet min/max
  statistics make file- and row-group-level skipping effective for
  range/point predicates on those columns (the poor-man's Z-order for
  one dominant access path).

Both work through the Hadoop FileSystem API of the path's scheme, so
they apply unchanged to ``s3a://``/``gs://`` paths under the cloud
profile in :mod:`~dropbox_duckdb_playground_spark.session`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def data_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a Parquet directory, through the
    scheme's Hadoop FileSystem (works for local, s3a, gs)."""
    fs, jpath = _fs_and_path(spark, path)
    it = fs.listFiles(jpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    sort_within: list[str] | None = None,
    min_gain_files: int = 2,
) -> dict:
    """Rewrite the Parquet directory at ``path`` into
    ``ceil(total_bytes / target_file_mb)`` files (optionally sorted
    within files by ``sort_within`` for stats-based skipping).

    Skips the rewrite when it would not reduce the file count by at
    least ``min_gain_files``. The rewrite stages into ``<path>__compact``
    and swaps via FileSystem rename — the standard (non-transactional)
    directory swap; readers racing the swap window need a table format
    with a commit log, which is out of scope here and documented.

    Returns {"files_before", "files_after", "bytes", "compacted"}.
    """
    n_before, total = data_file_stats(spark, path)
    n_target = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    if n_before - n_target < min_gain_files:
        return {
            "files_before": n_before,
            "files_after": n_before,
            "bytes": total,
            "compacted": False,
        }
    df = spark.read.parquet(path)
    if sort_within:
        df = df.repartitionByRange(n_target, *sort_within).sortWithinPartitions(
            *sort_within
        )
    elif n_target < n_before:
        # coalesce avoids a shuffle entirely: compaction is IO-bound,
        # and narrow-merging existing files is exactly what we want
        df = df.coalesce(n_target)
    staging = path.rstrip("/") + "__compact"
    df.write.mode("overwrite").parquet(staging)
    fs, jpath = _fs_and_path(spark, path)
    _, jstaging = _fs_and_path(spark, staging)
    fs.delete(jpath, True)
    fs.rename(jstaging, jpath)
    n_after, _ = data_file_stats(spark, path)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes": total,
        "compacted": True,
    }


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as Parquet clustered on ``cluster_by``: rows are
    range-partitioned across ``n_files`` output files and sorted within
    each, so every file covers a narrow, near-disjoint range of the
    clustering key. Point/range predicates on that key then skip whole
    files via Parquet footer min/max before any row group is read —
    at scale this turns a full-table scan into touching a handful of
    objects. ``n_files`` defaults to the current shuffle-partition
    setting."""
    sess = df.sparkSession
    if n_files is None:
        n_files = int(sess.conf.get("spark.sql.shuffle.partitions", "200"))
    (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as Parquet Z-ordered on ``cluster_by``: each
    clustering column is quantile-bucketized to ``2**bits`` ranks, the
    ranks' bits are interleaved into one Morton code, and rows are
    range-partitioned + sorted on that code. Unlike
    :func:`clustered_write` (one dominant access path), Z-order keeps
    every file's footer min/max narrow on EVERY clustering column, so
    point/range predicates on any of them skip files.

    Scale: bucket boundaries come from ``approxQuantile`` — a single
    sketch aggregation whose driver-side result is ``2**bits`` doubles
    per column, independent of row count. The Morton code itself is a
    codegen'd shift/or expression; no Python runs per row.
    """
    from pyspark.sql import functions as F

    sess = df.sparkSession
    if n_files is None:
        n_files = int(sess.conf.get("spark.sql.shuffle.partitions", "200"))
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    rank_cols = []
    for i, c in enumerate(cluster_by):
        cuts = df.approxQuantile(c, probs, 0.001)
        # rank = number of cut points below the value. Built as ONE SQL
        # expression string: a chain of hundreds of Column ops would
        # cost ~1-3ms of py4j round-trip each at build time. NULLs rank
        # 0 (IF(NULL > cut) -> false).
        if cuts:
            terms = " + ".join(
                f"IF(CAST(`{c}` AS DOUBLE) > {cut!r}, 1, 0)" for cut in cuts
            )
            rank = F.expr(f"CAST({terms} AS BIGINT)")
        else:
            rank = F.lit(0).cast("bigint")
        rank_cols.append(rank.alias(f"__zr{i}"))
    ranked = df.select("*", *rank_cols)
    # Morton interleave: output bit (b * ncols + i) = bit b of rank i
    ncols = len(cluster_by)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i in range(ncols):
            bit = F.shiftright(F.col(f"__zr{i}"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + i))
    zed = ranked.withColumn("__zval", z)
    (
        zed.repartitionByRange(n_files, "__zval")
        .sortWithinPartitions("__zval")
        .select(*df.columns)
        .write.mode(mode)
        .parquet(path)
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
) -> dict:
    """MERGE-shape upsert into a Parquet directory: rows in ``updates``
    replace same-key rows in the table, new keys are inserted, all other
    rows carry over. Stages into ``<path>__merge`` and swaps via
    FileSystem rename — same (non-transactional) swap caveat as
    :func:`compact`; a commit-log table format is the transactional
    upgrade path.

    Scale: one anti-join of the table against the (typically small,
    broadcast-able) update set — history is rewritten but never
    re-shuffled on a key, and the update set never grows with table
    size. Returns {"inserted", "updated", "total"}.
    """
    from pyspark.sql import functions as F

    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        updates.write.parquet(path)
        n = updates.count()
        return {"inserted": n, "updated": 0, "total": n}

    target = spark.read.parquet(path)
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    merged = kept.unionByName(updates)

    staging = path.rstrip("/") + "__merge"
    merged.write.mode("overwrite").parquet(staging)
    # counts BEFORE the swap: `target`/`kept` are lazy plans over `path`
    # and would silently re-scan the merged data afterwards
    n_target = target.count()
    n_kept = kept.count()
    n_updates = updates.count()
    _, jstaging = _fs_and_path(spark, staging)
    fs.delete(jpath, True)
    fs.rename(jstaging, jpath)
    return {
        "inserted": n_updates - (n_target - n_kept),
        "updated": n_target - n_kept,
        "total": n_kept + n_updates,
    }
