"""File-layout operators: compaction + clustered writes.

The correctness claim is row-identity; the scale claim is the physical
layout itself — file counts and per-file min/max disjointness — which
we assert directly from the written objects' footers.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.operators.layout import (
    clustered_write,
    compact,
    data_file_stats,
)


def _data_files(path: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(p).startswith(("_", "."))
    ]


def test_compact_merges_small_files(spark, tmp_path):
    path = str(tmp_path / "shards")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    df.repartition(64).write.parquet(path)
    assert len(_data_files(path)) == 64

    res = compact(spark, path, target_file_mb=256)
    assert res["compacted"] and res["files_before"] == 64
    assert res["files_after"] == 1  # 10k rows << 256 MB
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.exceptAll(df).isEmpty()


def test_compact_skips_when_no_gain(spark, tmp_path):
    path = str(tmp_path / "one")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    res = compact(spark, path, target_file_mb=256)
    assert not res["compacted"] and res["files_after"] == res["files_before"]


def test_data_file_stats_counts_only_data(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 100).coalesce(2).write.parquet(path)
    n, total = data_file_stats(spark, path)
    assert n == 2 and total > 0


def test_clustered_write_files_are_range_disjoint(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(0, 50_000).select(
        F.col("id"),
        (F.xxhash64("id") % 1000).alias("k"),  # unordered cluster key
    )
    clustered_write(df, path, cluster_by=["k"], n_files=8)

    files = _data_files(path)
    assert len(files) == 8
    # footer min/max per file: clustering must make key ranges
    # (near-)disjoint so predicates skip whole files
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("k")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    overlaps = sum(
        1 for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]) if hi1 > lo2
    )
    # rangepartitioning samples, so allow boundary ties but no broad overlap
    assert overlaps == 0, f"file key ranges overlap: {ranges}"

    back = spark.read.parquet(path)
    assert back.count() == 50_000
    assert back.exceptAll(df).isEmpty()


def test_compact_sorted_variant_orders_within_files(spark, tmp_path):
    path = str(tmp_path / "sorted")
    spark.range(0, 20_000).select(
        (F.xxhash64("id") % 97).alias("k"), F.col("id").alias("v")
    ).repartition(16).write.parquet(path)
    res = compact(spark, path, target_file_mb=256, sort_within=["k"])
    assert res["compacted"]
    f = _data_files(path)[0]
    ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
    assert ks == sorted(ks)


def test_zorder_write_narrows_both_dims(spark, tmp_path):
    from dropbox_duckdb_playground_spark.operators.layout import zorder_write

    path = str(tmp_path / "zed")
    # 64x64 grid: every (a, b) combination once
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.floor(F.col("id") / 64)).alias("b"),
        F.col("id").alias("payload"),
    )
    zorder_write(df, path, cluster_by=["a", "b"], n_files=16, bits=6)

    files = _data_files(path)
    assert 2 <= len(files) <= 16
    # row identity
    again = spark.read.parquet(path)
    assert again.count() == 4096
    assert again.select(F.sum("payload")).first()[0] == 4096 * 4095 // 2
    # the z-order property: EVERY file covers a narrow range of BOTH
    # dims (a pure sort on `a` would leave b spanning 0..63 in every
    # file). Allow slack for quantile-boundary rows.
    for f in files:
        md = pq.read_metadata(f)
        for ci, col in ((0, "a"), (1, "b")):
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            span = max(maxs) - min(mins)
            assert span <= 40, f"{f} {col} span {span}"


def test_merge_upsert(spark, tmp_path):
    from dropbox_duckdb_playground_spark.operators.layout import merge_upsert

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )
    # first merge into a missing table = plain insert
    res = merge_upsert(spark, path, base, keys=["k"])
    assert res == {"inserted": 3, "updated": 0, "total": 3}

    updates = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], ["k", "name", "v"]
    )
    res = merge_upsert(spark, path, updates, keys=["k"])
    assert res == {"inserted": 1, "updated": 1, "total": 4}
    got = sorted(
        (r.k, r.name, r.v) for r in spark.read.parquet(path).collect()
    )
    assert got == [(1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)]
    # staging dir must not linger
    import os

    assert not os.path.exists(path + "__merge")
