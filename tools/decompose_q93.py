"""Decompose q93_hll_distinct's gap vs the DuckDB oracle (VERDICT r6 #5).

q93's documented explanation for its sf0.1 multiple is the "md5 parity
tax": the portable 60-bit register hash must be md5-derived so DuckDB
can reproduce it bit-identically (sketches._phash), while an
engine-private sketch would use xxhash64. This script times the SAME
q93 plan three ways at the given sf_dir:

  md5      — the committed query (portable hash, oracle-checkable)
  xxhash64 — identical plan with sketches._phash swapped for an
             xxhash64-derived 60-bit hash (parity-off: register values
             differ, cardinality estimate quality equivalent)
  nohash   — hash replaced by the value itself (v % 2^60): bounds the
             non-hash residue (scan + distinct + registers + joins)

If (md5 - xxhash64) explains >=80% of the gap to the oracle, the tax is
measured and the multiple is the documented cost of cross-engine
checkability; whatever remains is real plan fat.

Usage: python tools/decompose_q93.py [sf_dir] (reps via
SPARK_GRAFT_BENCH_REPS, default 3)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.operators import sketches as SK
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("decompose_q93")
    fn = entrymod.queries()["q93_hll_distinct"]
    warm = sf_dir if not os.path.isdir("/root/testdata/sf0.001") else "/root/testdata/sf0.001"

    md5_phash = SK._phash

    def xx_phash(col, salt):
        # engine-private 60-bit hash: same width/nonnegativity contract
        return (
            F.xxhash64(F.concat(F.lit(salt), col.cast("string")))
            .bitwiseAND(F.lit((1 << 60) - 1))
            .cast("bigint")
        )

    def no_phash(col, salt):
        return F.abs(col.cast("bigint")) % F.lit(1 << 60)

    results = {}
    for label, ph in (("md5", md5_phash), ("xxhash64", xx_phash), ("nohash", no_phash)):
        SK._phash = ph
        try:
            fn(spark, warm).write.format("noop").mode("overwrite").save()  # warm
            quiesce(spark)
            times = []
            for _ in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
                quiesce(spark)
            results[label] = min(times)
            print(f"Q93 {label}: best={min(times)} all={times}", flush=True)
        finally:
            SK._phash = md5_phash

    tax = results["md5"] - results["xxhash64"]
    print(
        f"Q93 DECOMPOSITION: md5={results['md5']}s xxhash64={results['xxhash64']}s "
        f"nohash={results['nohash']}s md5_tax={tax:.3f}s "
        f"(tax share of md5 time: {100 * tax / results['md5']:.0f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
