"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (write to a count-consuming action)
so the measured time covers the full plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm up the JVM/codegen on the smallest sf so measured times are the
    # steady-state plan execution, not first-call JIT compilation. Every
    # query runs once: the heavy expression trees (simhash bit-sums,
    # cosine folds) each JIT their own generated classes.
    from dropbox_duckdb_playground_spark.session import clear_persisted

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.environ.get("SPARK_GRAFT_NO_WARM") != "1":
        for fn in qs.values():
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass
            clear_persisted(spark)

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # force full execution; count() on the final frame executes
            # every operator (aggregations/joins/windows can't be pruned)
            df.count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # record failures as -1, keep benching
            sys.stderr.write(f"bench: {name} failed: {exc}\n")
            timings[name] = -1.0
        # quiesce between queries (outside the timed window): release
        # this query's localCheckpoint blocks and absorb the GC pause
        # they'd otherwise trigger mid-next-query
        clear_persisted(spark)
        spark.sparkContext._jvm.System.gc()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
