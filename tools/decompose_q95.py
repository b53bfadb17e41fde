"""Interleaved A/B for q95's driver handshake (VERDICT r13 #7).

The committed q95 collects up to _BLOOM_DRIVER_COLLECT_CAP distinct
bench SHINGLE STRINGS to the driver (MBs pickled at sf0.1, the
allocation spike the r13 ParallelGC probe exposed), derives the 8 KiB
bloom bitmap from them in a pure-Python md5 loop, and re-parallelizes
the same strings for the exact-membership join. The candidate form
packs the bitmap IN SPARK (bit_or over shiftleft on the bloom_bits
table -> <= m/64 long rows collected, 8 KiB at any SF) and reuses one
materialized bench set for both the bitmap aggregate and the exact
join — guide §8: collect a fixed-size proxy, not the member payload;
the driver handshake becomes bounded BY CONSTRUCTION so the dual
cap-regime collapses.

Both forms run interleaved in one session, noop-timed best-of-reps,
and every rep asserts the two forms' sorted output hashes are equal.

Usage: python tools/decompose_q95.py [sf_dir] [rounds]
"""

from __future__ import annotations

import hashlib
import sys
import time

REPO = "/root/repo"
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def old_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.operators import dedup as D
    from dropbox_duckdb_playground_spark.operators import sketches as SK

    # the pre-r14 committed constant, inlined here so the old form stays
    # reconstructable after its removal from catalog.py
    _BLOOM_DRIVER_COLLECT_CAP = 1_000_000

    d = load(spark, sf_dir, "documents")
    sh = D.shingles(d, n=3)
    bench_distinct = (
        sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    )
    bench_vals = [
        row[0]
        for row in bench_distinct.limit(_BLOOM_DRIVER_COLLECT_CAP + 1).collect()
    ]
    train = sh.filter(F.col("doc_id") % 50 != 0)
    assert len(bench_vals) <= _BLOOM_DRIVER_COLLECT_CAP
    words = SK.bloom_bitmap_from_values(bench_vals)
    flags = SK.bloom_contains_bits(train, words, "shingle")
    exact = F.broadcast(
        spark.createDataFrame(
            [(v,) for v in bench_vals], schema="shingle string"
        ).withColumn("__hit__", F.lit(1))
    )
    return _tail(flags, exact)


def new_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.materialize import materialize
    from dropbox_duckdb_playground_spark.operators import dedup as D
    from dropbox_duckdb_playground_spark.operators import sketches as SK

    d = load(spark, sf_dir, "documents")
    sh = D.shingles(d, n=3)
    bench_m = materialize(
        sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    )
    bits = SK.bloom_bits(bench_m, "shingle")
    rows = (
        bits.groupBy(F.shiftright(F.col("bit"), 6).cast("int").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT)))"
            ).alias("word")
        )
        .collect()
    )
    words = [0] * (SK.BLOOM_M // 64)
    for r in rows:
        words[r["w"]] = r["word"] & ((1 << 64) - 1)
    train = sh.filter(F.col("doc_id") % 50 != 0)
    flags = SK.bloom_contains_bits(train, words, "shingle")
    exact = bench_m.withColumn("__hit__", F.lit(1))
    return _tail(flags, exact)


def _tail(flags: DataFrame, exact: DataFrame) -> DataFrame:
    return (
        flags.join(exact, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.col("in_bloom").cast("int")).cast("long").alias(
                "n_bloom_hits"
            ),
            F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
            .cast("long")
            .alias("n_exact_hits"),
            (
                F.sum(F.col("in_bloom").cast("int"))
                - F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
            )
            .cast("long")
            .alias("n_false_pos"),
        )
    )


def digest(df: DataFrame) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.md5(str(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("q95_ab")
    forms = {"old": old_form, "new": new_form}
    # shape warm + output-equality check
    digests = {}
    for label, fn in forms.items():
        digests[label] = digest(fn(spark, "/root/testdata/sf0.001"))
        quiesce(spark)
    assert digests["old"] == digests["new"], digests
    print(f"sf0.001 digests equal: {digests['old']}", flush=True)
    acc = {k: [] for k in forms}
    for i in range(rounds):
        for label, fn in forms.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            acc[label].append(round(time.time() - t0, 3))
            quiesce(spark)
        print(f"round {i}: " + " ".join(f"{k}={acc[k][-1]}" for k in acc), flush=True)
    for k, v in acc.items():
        v_sorted = sorted(v)
        print(f"{k}: median={v_sorted[len(v)//2]} all={v}", flush=True)
    # full-scale output equality once at the end (timed runs used noop)
    d_old = digest(forms["old"](spark, sf_dir))
    quiesce(spark)
    d_new = digest(forms["new"](spark, sf_dir))
    assert d_old == d_new, (d_old, d_new)
    print(f"{sf_dir} digests equal: {d_old}", flush=True)


if __name__ == "__main__":
    main()
