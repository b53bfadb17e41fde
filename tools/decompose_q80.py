"""Adjudicate q80_boilerplate's sf1 multiple (VERDICT r8 #4).

SF1_BENCH r8: 1.49s vs oracle 0.59s = 2.5x, slope1000 2.20 — real
growth, never profiled at sf1 (the window-over-join rewrite was only
measured at sf0.1). The plan is scan -> fan_out -> tokenize/ngram/
explode (in-row array_distinct, no dedupe exchange) -> window exchange
on the shingle string -> per-doc rollup exchange. This script bounds
the stages and A/Bs the candidate trims in ONE session:

  full         — committed plan
  shingle_only — D.shingles() to noop: fan_out + map cost, no window
  digestkey    — window keys xxhash64(shingle), string dropped before
                 the exchange (the q89 trick; 8B key vs ~20B string —
                 routing-only here, a collision just co-partitions two
                 grams, the COUNT still keys on nothing else, so
                 correctness needs the count keyed on the digest too:
                 acceptable only if collisions are negligible at the
                 corpus's gram cardinality — measured, not assumed)
  nofan        — committed plan minus the fan_out exchange (q89's
                 interleaved A/B showed fan_out LOSES at sf1: the
                 round-robin exchange costs more than 2->32-way map
                 parallelism buys on a 5.8 MB text table)
  nofan_digest — both trims
  scan_only    — floor

Usage: python tools/decompose_q80.py [sf_dir]  (reps via
SPARK_GRAFT_BENCH_REPS, default 3)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata_sf1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from pyspark.ml.feature import NGram
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.operators import dedup as D
    from dropbox_duckdb_playground_spark.operators import relational as RL
    from dropbox_duckdb_playground_spark.operators import text as TX
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("decompose_q80")

    def shingles_inline(d, fan: bool):
        src = (RL.fan_out(d) if fan else d).select(
            F.col("doc_id"), F.split(F.trim(F.col("text")), r"\s+").alias("__toks__")
        )
        src = NGram(n=3, inputCol="__toks__", outputCol="__ngrams__").transform(src)
        return src.select(
            F.col("doc_id"),
            F.explode(F.array_distinct(F.col("__ngrams__"))).alias("shingle"),
        )

    def q80(sh, digest: bool):
        if digest:
            sh = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))
        wdf = sh.withColumn(
            "n_docs", F.count("*").over(Window.partitionBy("shingle"))
        )
        boiler = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
        return (
            wdf.groupBy("doc_id")
            .agg(
                F.count("*").alias("n_grams"),
                F.sum(boiler).cast("long").alias("n_boiler"),
            )
            .select(
                "doc_id",
                "n_grams",
                "n_boiler",
                TX.ratio4_expr("n_boiler", "n_grams").alias("boiler_ratio"),
            )
        )

    def plan(label: str):
        d = load(spark, sf_dir, "documents")
        if label == "scan_only":
            return d.groupBy().agg(F.count("*").alias("n"))
        if label == "shingle_only":
            return D.shingles(d, n=3)
        fan = "nofan" not in label
        digest = "digest" in label
        return q80(shingles_inline(d, fan), digest)

    results = {}
    for label in (
        "full", "digestkey", "nofan", "nofan_digest", "shingle_only",
        "scan_only",
    ):
        plan(label).write.format("noop").mode("overwrite").save()  # warm
        quiesce(spark)
        times = []
        for _ in range(reps):
            t0 = time.time()
            plan(label).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            quiesce(spark)
        results[label] = min(times)
        print(f"Q80 {label}: best={min(times)} all={times}", flush=True)

    load1 = open("/proc/loadavg").read().split()[0]
    print(
        "Q80 DECOMPOSITION: " + " ".join(
            f"{k}={v}s" for k, v in results.items()
        ) + f" loadavg1={load1}",
        flush=True,
    )


if __name__ == "__main__":
    main()
