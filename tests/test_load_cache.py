"""Guards for catalog.load's per-session scan memoization (ADVICE r6):
a same-path parquet rewrite must invalidate the cached plan (the entry
is mtime-guarded and replaced in place, so rewrites never accumulate
stale siblings), and cache eviction must drop dead-session entries
before it ever clears the live session's hot entries.
"""

from __future__ import annotations

import os
import time

from dropbox_duckdb_playground_spark import catalog


def test_same_path_rewrite_invalidates(spark, tmp_path):
    p = str(tmp_path)
    spark.range(3).selectExpr("id AS a").write.mode("overwrite").parquet(
        os.path.join(p, "customer.parquet")
    )
    df1 = catalog.load(spark, p, "customer")
    assert df1.columns == ["a"]
    n_before = len(catalog._LOAD_CACHE)
    # rewrite with a DIFFERENT schema at the same path; bump mtime in
    # case the filesystem's mtime granularity is coarse
    time.sleep(0.05)
    spark.range(3).selectExpr("id AS a", "id + 1 AS b").write.mode(
        "overwrite"
    ).parquet(os.path.join(p, "customer.parquet"))
    os.utime(os.path.join(p, "customer.parquet"))
    df2 = catalog.load(spark, p, "customer")
    assert df2.columns == ["a", "b"], "stale cached plan returned after rewrite"
    # the rewrite REPLACED the entry (same key, new mtime) — no
    # stale-mtime sibling accumulates
    assert len(catalog._LOAD_CACHE) == n_before


def test_eviction_prefers_dead_sessions(spark, tmp_path):
    p = str(tmp_path)
    spark.range(1).selectExpr("id AS a").write.mode("overwrite").parquet(
        os.path.join(p, "region.parquet")
    )
    live = catalog.load(spark, p, "region")
    live_keys = [k for k in catalog._LOAD_CACHE if k[1].startswith(p)]
    assert live_keys, "live entry not cached"
    # flood the cache with dead-session keys to trip the eviction bound
    for i in range(300):
        catalog._LOAD_CACHE[(f"dead-app-{i}", f"/nowhere/{i}.parquet")] = (0, live)
    # eviction only runs on a cache MISS (a hit returns before the
    # bound check) — write and load a fresh path to force one
    spark.range(1).selectExpr("id AS a").write.mode("overwrite").parquet(
        os.path.join(p, "nation.parquet")
    )
    catalog.load(spark, p, "nation")
    remaining = list(catalog._LOAD_CACHE)
    assert all(not k[0].startswith("dead-app-") for k in remaining), (
        "dead-session entries survived eviction"
    )
    assert any(k[1].startswith(p) for k in remaining), (
        "live session's entries were evicted while dead ones existed"
    )


def test_inplace_partfile_rewrite_bumps_stamp(spark, tmp_path):
    """ADVICE r7: Spark-written parquet is a DIRECTORY; rewriting a
    part-file's CONTENTS in place does not bump the directory mtime, so
    the invalidation stamp must look at the children. (Scoped to the
    stamp function: whether a fresh spark.read then sees the new bytes
    also involves Spark's own session-level file-status caches, which
    are outside load()'s contract.)"""
    p = str(tmp_path)
    dirpath = os.path.join(p, "supplier.parquet")
    spark.range(3).selectExpr("id AS a").write.mode("overwrite").parquet(dirpath)
    stamp0 = catalog._parquet_mtime_ns(dirpath)
    dir_mtime = os.stat(dirpath).st_mtime_ns
    part = next(
        os.path.join(dirpath, f)
        for f in os.listdir(dirpath)
        if f.endswith(".parquet")
    )
    time.sleep(0.05)
    # rewrite the part-file in place (same entry names) and PIN the
    # directory mtime back to its old value — the dir alone would not
    # reveal the rewrite
    with open(part, "ab") as fh:
        fh.write(b"")
        os.utime(part)
    os.utime(dirpath, ns=(dir_mtime, dir_mtime))
    stamp1 = catalog._parquet_mtime_ns(dirpath)
    assert stamp1 > stamp0, (
        "in-place part-file rewrite did not bump the invalidation stamp"
    )


def test_unstattable_path_bypasses_cache(spark, tmp_path):
    """On OSError the cache must be bypassed in BOTH directions: no
    lookup of a previously cached frame, no storing an uninvalidatable
    entry."""
    import pytest

    p = str(tmp_path)
    missing = os.path.join(p, "part.parquet")
    n_before = len(catalog._LOAD_CACHE)
    with pytest.raises(Exception):
        catalog.load(spark, p, "part")  # spark.read raises the real error
    assert len(catalog._LOAD_CACHE) == n_before, (
        "an entry was cached for an unstat-able path"
    )
    assert not any(k[1] == missing and v[0] is None
                   for k, v in catalog._LOAD_CACHE.items())
