"""Driver-protocol A/B for the r13 q77/q116 hint drops (VERDICT r13 #2).

The r13 audit dropped forced F.broadcast hints from q77's per-user
funnel frontiers and q116's vocabulary-count joins (both frames scale
with a data dimension -> OOM at 100 TB). Warm interleaved A/Bs said
neutral-to-faster, but the driver's cold-JVM 32-core bench row read
q77 +57% / q116 +21%. This probe re-adjudicates under the DRIVER's own
protocol: a fresh process per invocation (cold JVM), one untimed warm
rep at sf0.001 (bench.py's warm pass), then best-of-2 noop-timed reps
at the target SF — run alternately per form (A, B, A, B ...) and
compare per-form best-of-run medians.

Forms:
  nohint — the committed r13 code (joins left to AQE)
  hint   — the pre-r13 forced-broadcast form, reconstructed here
           (the probe builds both plans inline so the committed
           catalog stays untouched during the A/B)

Usage: python tools/decompose_q77q116.py {nohint|hint} [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def q77(spark: SparkSession, sf_dir: str, hint: bool) -> DataFrame:
    from dropbox_duckdb_playground_spark.catalog import load

    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(v) if hint else v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c) if hint else c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("buy_ts"))
    )
    one = lambda df, name: df.agg(  # noqa: E731
        F.count("*").alias("n_users")
    ).select(F.lit(name).alias("stage"), "n_users")
    return (
        one(v, "view")
        .unionAll(one(c, "click_after_view"))
        .unionAll(one(p, "purchase_after_click"))
    )


def q116(spark: SparkSession, sf_dir: str, hint: bool) -> DataFrame:
    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.operators import text as TX

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(TX.tokens_col("text")).alias("p", "tok")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    bi = toks.select(
        F.col("tok").alias("w1"), F.lead("tok", 1).over(wdoc).alias("w2")
    ).filter(F.col("w2").isNotNull())
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uc = bi.groupBy(F.col("w1").alias("w")).agg(F.count("*").alias("c"))
    n = bc.agg(F.sum("c12").alias("n"))
    pmi = F.round(
        F.log(
            F.col("c12").cast("double") * F.col("n") / F.col("u1c") / F.col("u2c")
        ),
        4,
    )
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("u1c"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("u2c"))
    scored = (
        bc.filter(F.col("c12") >= 5)
        .join(F.broadcast(u1) if hint else u1, "w1")
        .join(F.broadcast(u2) if hint else u2, "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c12", pmi.alias("pmi"))
    )
    wtop = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 20)
        .select("w1", "w2", "c12", "pmi")
    )


def main() -> None:
    form = sys.argv[1]
    assert form in ("nohint", "hint"), form
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    hint = form == "hint"
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark(f"q77q116_{form}")
    warm = "/root/testdata/sf0.001"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    for label, builder in (("q77", q77), ("q116", q116)):
        builder(spark, warm, hint).write.format("noop").mode("overwrite").save()
        quiesce(spark)
        times = []
        for _ in range(reps):
            t0 = time.time()
            builder(spark, sf_dir, hint).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
            quiesce(spark)
        print(f"{form} {label}: best={min(times)} all={times}", flush=True)


if __name__ == "__main__":
    main()
