"""Adjudicate q89_chunk_dedup's sf1 multiple (VERDICT r8 #3).

The committed SF1_BENCH r8 row read 1.41s vs oracle 0.27s = 5.2x with
slope1000 3.08 — real data growth, never decomposed. The r8 plan keyed
the first-occurrence window on the RAW 20-token chunk string, so the
corpus-sized exchange moved ~120 chars per chunk; the docstring's own
100 TB note says the key should be a 128-bit digest. This script times
the SAME rollup plan both ways in ONE session (the only decision-grade
comparison under host drift) plus the stage bounds:

  digest     — committed r9 plan: window keys md5(chunk_text), the
               string is dropped BEFORE the exchange (16-byte key)
  string     — r8 plan: window keys raw chunk_text (string shuffled)
  chunk_only — chunk_documents + digest projection to noop, no window:
               bounds the tokenize/chunk/md5 map cost every variant pays
  scan_only  — documents scan + count: the floor any plan pays

digest - chunk_only ~= the two exchanges + window + rollup; if
string - digest is small, the multiple is map-side chunking cost (a
per-row tokenize the oracle also pays, but in C++), not shuffle fat.

Usage: python tools/decompose_q89.py [sf_dir]  (reps via
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

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.operators import relational as RL
    from dropbox_duckdb_playground_spark.operators import text as TX
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("decompose_q89")

    def rollup(ch):
        w = Window.partitionBy("k").orderBy("doc_id", "chunk_id")
        flagged = ch.withColumn(
            "dup", F.when(F.row_number().over(w) > 1, 1).otherwise(0)
        )
        return flagged.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("dup").cast("long").alias("n_dup"),
            F.sum(F.when(F.col("dup") == 0, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )

    KEYS = {
        "digest": lambda: F.md5("chunk_text"),
        "xx": lambda: F.xxhash64("chunk_text"),
        "string": lambda: F.col("chunk_text"),
    }

    def chunks(d, keyed: str):
        ch = TX.chunk_documents(d, chunk_tokens=20, overlap=0)
        return ch.select(
            "doc_id", "chunk_id", "n_tokens", KEYS[keyed]().alias("k")
        )

    def plan(label: str):
        d = load(spark, sf_dir, "documents")
        if label == "scan_only":
            return d.groupBy().agg(F.count("*").alias("n"))
        if label == "chunk_only":
            return chunks(d, "digest")
        if label == "chunk_str_only":
            return chunks(d, "string")
        if label.startswith("fanout_"):
            return rollup(chunks(RL.fan_out(d), label.split("_", 1)[1]))
        return rollup(chunks(d, label))

    results = {}
    for label in (
        "digest", "xx", "string", "chunk_only", "chunk_str_only",
        "fanout_digest", "fanout_string", "scan_only",
    ):
        df = plan(label)
        df.write.format("noop").mode("overwrite").save()  # warm
        quiesce(spark)
        times = []
        for _ in range(reps):
            t0 = time.time()
            plan(label).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            quiesce(spark)
        results[label] = min(times)
        print(f"Q89 {label}: best={min(times)} all={times}", flush=True)

    load1 = open("/proc/loadavg").read().split()[0]
    print(
        "Q89 DECOMPOSITION: digest={digest}s string={string}s "
        "chunk_only={chunk_only}s scan_only={scan_only}s "
        "key_saving={sav:.3f}s chunk_share_of_digest={share:.0f}% "
        "loadavg1={la}".format(
            sav=results["string"] - results["digest"],
            share=100 * results["chunk_only"] / results["digest"],
            la=load1,
            **results,
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
