"""Shuffle-codec probe: time a query list under one
``spark.io.compression.codec`` value (static conf — new JVM per codec).

Guide §2.3: lz4 (default) vs zstd is workload-dependent; zstd's ratio
win prices in when shuffle bytes cross a real network/disk, while at
bench scale shuffle files live in page cache and the codec is pure CPU.
Run this alternately per codec (A, B, A, B process interleave) and
compare medians; the decision is recorded in OPTIMIZATION_r13.md.

Usage: python tools/decompose_codec.py <codec> [sf_dir] [q ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "q26_jaccard_pairs",
    "q105_triangle_count",
    "q88_tpch_q21",
    "q34_er_doc_clusters",
]


def main() -> None:
    codec = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_QUERIES
    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark(
        f"codec_{codec}", extra_conf={"spark.io.compression.codec": codec}
    )
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
        print(f"CODEC {codec} {name}: best={min(times)} all={times}", flush=True)


if __name__ == "__main__":
    main()
