"""JVM garbage-collector probe: time a query cross-section under one
collector (static JVM option — new process per side).

Guide §5: in local mode the driver JVM is the only executor, so its
collector choice governs every task. Spark on JDK 17+ runs G1 by
default; throughput collectors (ParallelGC) often win short-lived batch
work by trading pause time for scan speed. pyspark's builder conf
cannot set driver JVM flags (the gateway JVM is launched from
PYSPARK_SUBMIT_ARGS before conf applies), so this tool expects the
caller to pass the flag via JAVA_TOOL_OPTIONS, e.g.:

    python tools/decompose_gc.py g1 ...                 # default G1
    JAVA_TOOL_OPTIONS=-XX:+UseParallelGC \
        python tools/decompose_gc.py parallel ...

Run alternately per side (A, B, A, B process interleave) and compare
per-query medians; the tool prints the ACTUAL collector beans from the
live JVM so a mislabeled run is self-evident. Decision recorded in
OPTIMIZATION_r13.md.

Usage: [JAVA_TOOL_OPTIONS=...] python tools/decompose_gc.py <label> [sf_dir] [q ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "q105_triangle_count",
    "q26_jaccard_pairs",
    "q43_flagship_graph",
    "q92_pagerank",
    "q120_train_manifest",
    "q34_er_doc_clusters",
    "q57_group_median",
    "q88_tpch_q21",
]


def main() -> None:
    label = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_QUERIES
    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark(f"gc_{label}")
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    gc_names = [beans.get(i).getName() for i in range(beans.size())]
    print(f"GC {label} beans: {gc_names}", flush=True)
    qs = entrymod.queries()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    for name in names:
        fn = qs[name]
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        quiesce(spark)
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            quiesce(spark)
        print(f"GC {label} {name}: best={min(times)} all={times}", flush=True)


if __name__ == "__main__":
    main()
