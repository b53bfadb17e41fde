"""r13 broadcast-audit A/B: forced-hint vs AQE-decided joins.

VERDICT r12 flagged forced `F.broadcast` on data-dependent-size frames
as the one 100x-scale hygiene item: q77_event_funnel broadcast its
per-user view/click frontiers and q116_bigram_pmi broadcast its
vocabulary-sized unigram table — both frames scale with the data (user
dimension / Heaps-law vocabulary), so the hint that is free at sf1 is
a driver OOM at web scale. The catalog now leaves those joins to AQE.

This probe INLINES the pre-adoption A forms (per the decompose-tool
protocol: never call the catalog for A, or post-adoption reruns compare
B vs B) and interleaves A/B x3 at the given SF, reporting medians.

Result (sf0.1, local[32], recorded in NOTES_r13.md):
the hint drop is timing-neutral — AQE picks broadcast itself.
"""

import json
import statistics
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, "/root/repo")
from dropbox_duckdb_playground_spark.catalog import (  # noqa: E402
    REGISTRY,
    load,
)
from dropbox_duckdb_playground_spark.operators import text as TX  # noqa: E402


def q77_hinted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r13 q77: frontiers force-broadcast (catalog.py @ fc204df)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
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


def q116_hinted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r13 q116: unigram table force-broadcast twice (@ fc204df)."""
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
    scored = (
        bc.filter(F.col("c12") >= 5)
        .join(
            F.broadcast(uc.select(F.col("w").alias("w1"), F.col("c").alias("u1c"))),
            "w1",
        )
        .join(
            F.broadcast(uc.select(F.col("w").alias("w2"), F.col("c").alias("u2c"))),
            "w2",
        )
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("decompose_broadcast_audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pairs = [
        ("q77_event_funnel", q77_hinted),
        ("q116_bigram_pmi", q116_hinted),
    ]
    # warm-up pass so JIT/codegen cost lands outside the measurement
    for name, hinted in pairs:
        hinted(spark, sf_dir).collect()
        REGISTRY[name].fn(spark, sf_dir).collect()

    out = {}
    for name, hinted in pairs:
        ta, tb, rows_a, rows_b = [], [], None, None
        for _ in range(3):  # interleaved A/B, median-of-3
            t0 = time.monotonic()
            rows_a = len(hinted(spark, sf_dir).collect())
            ta.append(time.monotonic() - t0)
            t0 = time.monotonic()
            rows_b = len(REGISTRY[name].fn(spark, sf_dir).collect())
            tb.append(time.monotonic() - t0)
        out[name] = {
            "hinted_median_s": round(statistics.median(ta), 3),
            "aqe_median_s": round(statistics.median(tb), 3),
            "hinted_reps": [round(x, 3) for x in ta],
            "aqe_reps": [round(x, 3) for x in tb],
            "rows_hinted": rows_a,
            "rows_aqe": rows_b,
        }
    print(json.dumps({"sf_dir": sf_dir, "results": out}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
