"""Per-stage decomposition of q106_bm25_topk at sf1 (VERDICT r8 #2).

The committed artifacts read 4.6x vs the oracle while the r8 builder's
quiet-window A/B read ~1.9x; the quiet reading has not reproduced
(r9: timeq best 2.29s vs oracle 0.42s = 5.4x on an idle-CPU host), so
this script supplies the decomposition the adjudication requires —
naming the dominant stage with seconds — and A/Bs the barrier CHOICE:

  full     — committed plan: eager materialize() (localCheckpoint) of
             the 1.16M-row tf table, three downstream consumers
  pin      — same plan, barrier swapped for pin() (lazy
             persist(MEMORY_AND_DISK)): InMemoryRelation matching is
             plan-fragment-based, so branch-specific pushed filters —
             the thing that breaks ReusedExchange — do NOT break cache
             reuse; the first consumer populates, later ones read back
  none     — no barrier: every consumer re-tokenizes (the r8-rejected
             shape, re-measured for the record)
  tf_mat   — the materialize job alone (tokenize + tf agg + checkpoint
             write): the part of `full` that is NOT downstream work
  tf_lazy  — tokenize + tf agg to noop, no barrier: the tf build cost
             a single-consumer plan would pay
  scan     — documents scan floor

full - tf_mat = downstream (qterms agg + broadcast scoring + top-k
window) on checkpoint-read inputs. If tf_mat dominates and pin ~= full,
the multiple is the token-table build itself (a cost every shape pays
once), not the barrier.

Usage: python tools/decompose_q106.py [sf_dir]  (reps via
SPARK_GRAFT_BENCH_REPS, default 5; interleaved full/pin pairs)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata_sf1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    from pyspark.sql import functions as F

    from dropbox_duckdb_playground_spark import materialize as mat
    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.operators import text as TX
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("decompose_q106")

    barriers = {
        "full": mat.materialize,
        "pin": mat.pin,
        "none": lambda df: df,
    }

    def tf_plan(d):
        n_part = spark.sparkContext.defaultParallelism
        return (
            d.select("doc_id", "text")
            .repartition(n_part, F.col("doc_id"))
            .select(F.col("doc_id"), TX.tokens_col("text").alias("__toks"))
            .select(
                F.col("doc_id"),
                F.size("__toks").cast("long").alias("dl"),
                F.explode("__toks").alias("term"),
            )
            .groupBy("doc_id", "dl", "term")
            .agg(F.count("*").alias("tf"))
        )

    def run_once(label: str) -> float:
        d = load(spark, sf_dir, "documents")
        t0 = time.time()
        if label == "scan":
            d.groupBy().agg(F.count("*")).write.format("noop").mode(
                "overwrite"
            ).save()
        elif label == "tf_lazy":
            tf_plan(d).write.format("noop").mode("overwrite").save()
        elif label == "tf_mat":
            out = mat.materialize(tf_plan(d))
            out.unpersist() if hasattr(out, "unpersist") else None
        else:
            orig = TX.materialize
            TX.materialize = barriers[label]
            try:
                TX.bm25_topk(d).write.format("noop").mode("overwrite").save()
            finally:
                TX.materialize = orig
        dt = time.time() - t0
        spark.catalog.clearCache()
        quiesce(spark)
        return round(dt, 3)

    results: dict[str, list[float]] = {k: [] for k in (
        "full", "pin", "none", "tf_mat", "tf_lazy", "scan"
    )}
    for label in results:  # warm each shape once
        run_once(label)
    # interleave everything per rep so host drift hits all labels alike
    for _ in range(reps):
        for label in results:
            results[label].append(run_once(label))

    load1 = open("/proc/loadavg").read().split()[0]
    for label, ts in results.items():
        print(f"Q106 {label}: best={min(ts)} all={ts}", flush=True)
    best = {k: min(v) for k, v in results.items()}
    print(
        "Q106 DECOMPOSITION: "
        + " ".join(f"{k}={v}s" for k, v in best.items())
        + f" downstream={best['full'] - best['tf_mat']:.3f}s"
        + f" barrier_tax={best['tf_mat'] - best['tf_lazy']:.3f}s"
        + f" loadavg1={load1}",
        flush=True,
    )


if __name__ == "__main__":
    main()
