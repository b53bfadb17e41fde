"""q80 form shoot-out (r10): window vs broadcast-join gram frequency.

The window form exchanges the FULL shingle table by gram digest (and
sorts it inside WindowExec) before the doc-keyed aggregate. The gram
frequency table itself is tiny (~30k distinct grams on this corpus),
so an aggregate -> broadcast-join form replaces that corpus-sized
exchange+sort with a map-side-combined partial aggregate (~32x30k
rows) plus a broadcast hash join — IF the cost of producing the
shingle table twice (it has two consumers) doesn't eat the win.

Variants, all producing identical results (checked against each other
before any timing is trusted — the q105 size(NULL) lesson):
  A  window (current committed form)
  B  agg + broadcast join, shingle table computed twice (2x tokenize)
  C  agg + broadcast join, shingle table materialized once (checkpoint)

Protocol: same-session interleaved A/B/C reps at the given sf dir,
median of N printed per variant. Usage:
  python tools/decompose_q80b.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dropbox_duckdb_playground_spark.catalog import load  # noqa: E402
from dropbox_duckdb_playground_spark.materialize import materialize  # noqa: E402
from dropbox_duckdb_playground_spark.operators import dedup as D  # noqa: E402
from dropbox_duckdb_playground_spark.operators import text as TX  # noqa: E402
from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402


def _sh(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    sh = D.shingles(d, n=3)
    return sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))


def _finish(wdf):
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


def form_a(spark, sf_dir):
    sh = _sh(spark, sf_dir)
    return _finish(
        sh.withColumn("n_docs", F.count("*").over(Window.partitionBy("shingle")))
    )


def form_b(spark, sf_dir):
    sh = _sh(spark, sf_dir)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    return _finish(sh.join(F.broadcast(freq), "shingle"))


def form_c(spark, sf_dir):
    sh = materialize(_sh(spark, sf_dir))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    return _finish(sh.join(F.broadcast(freq), "shingle"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata_sf1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("q80b")
    spark.sparkContext.setLogLevel("ERROR")
    forms = {"A_window": form_a, "B_join_2x": form_b, "C_join_mat": form_c}

    # correctness cross-check FIRST: identical aggregate fingerprints
    fps = {}
    for name, fn in forms.items():
        fps[name] = fn(spark, sf_dir).agg(
            F.count("*"), F.sum("n_grams"), F.sum("n_boiler"),
            # ratio4 values are exact 4dp — sum them as integers so the
            # fingerprint is invariant to float addition order
            F.sum((F.col("boiler_ratio") * 10000).cast("long"))
        ).collect()[0]
        quiesce(spark)
    base = fps["A_window"]
    for name, fp in fps.items():
        tag = "OK" if fp == base else "MISMATCH"
        print(f"fingerprint {name}: {tuple(fp)} {tag}", flush=True)
    if any(fp != base for fp in fps.values()):
        print("ABORT: forms disagree — no timing is trustworthy")
        return 1

    times: dict[str, list[float]] = {n: [] for n in forms}
    for _ in range(reps):
        for name, fn in forms.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
            quiesce(spark)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}s "
            f"reps {[round(t, 3) for t in ts]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
