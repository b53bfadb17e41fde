"""Per-stage wall-time decomposition of q64_jaccard_capped (VERDICT r6 #4).

q64's sf0.1 multiple is measured stage-floor-bound, but the sf1 gap
(5.28s vs oracle 0.94s in SF1_BENCH.json) is real data time. This
script times PROGRESSIVE PREFIXES of the exact q64 plan at the given
sf_dir, each run to a noop sink, so consecutive differences attribute
seconds to plan stages:

  explode   — tokenize + NGram + distinct + explode (the shingle rows)
  digest    — + md5 60-bit digest of each shingle (_hex60)
  capwin    — + the count(*) OVER (PARTITION BY sh) frequency window
              and df <= cap filter (first shuffle)
  sizes     — + the per-doc surviving-shingle count aggregate
  full      — the committed q64 (self-join + pair aggregate + jaccard)

Usage: python tools/decompose_q64.py [sf_dir] (reps via
SPARK_GRAFT_BENCH_REPS, default 3)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.operators import dedup as D
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("decompose_q64")
    # q64 passes an EXPLICIT max_shingle_freq=3 (catalog.py) — the
    # prefixes must apply the same cap or the sizes/join deltas
    # measure a different surviving-shingle table than the real plan
    cap = 3
    warm = sf_dir if not os.path.isdir("/root/testdata/sf0.001") else "/root/testdata/sf0.001"

    def explode(sf):
        d = load(spark, sf, "documents")
        return D.shingles(d, n=3)

    def digest(sf):
        return explode(sf).select(
            "doc_id", D._hex60(F.col("shingle")).alias("sh")
        )

    def capwin(sf):
        fw = Window.partitionBy("sh")
        return (
            digest(sf)
            .withColumn("__df__", F.count("*").over(fw))
            .filter(F.col("__df__") <= cap)
            .drop("__df__")
        )

    def sizes(sf):
        return capwin(sf).groupBy("doc_id").agg(F.count("*").alias("sz"))

    full = entrymod.queries()["q64_jaccard_capped"]

    stages = [
        ("explode", explode),
        ("digest", digest),
        ("capwin", capwin),
        ("sizes", sizes),
        ("full", lambda sf: full(spark, sf)),
    ]
    best = {}
    for label, mk in stages:
        mk(warm).write.format("noop").mode("overwrite").save()
        quiesce(spark)
        times = []
        for _ in range(reps):
            t0 = time.time()
            mk(sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            quiesce(spark)
        best[label] = min(times)
        print(f"Q64 stage {label}: best={min(times)} all={times}", flush=True)
    print(
        "Q64 DECOMPOSITION (consecutive deltas): "
        f"explode={best['explode']:.2f}s "
        f"+digest={best['digest'] - best['explode']:.2f}s "
        f"+capwin={best['capwin'] - best['digest']:.2f}s "
        f"+sizes={best['sizes'] - best['capwin']:.2f}s "
        f"+join_pairs={best['full'] - best['sizes']:.2f}s "
        f"full={best['full']:.2f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
