"""Per-JVM static-conf A/B: like tools/decompose_conf.py but for confs
that are read at SparkContext construction (core scheduler/shuffle
keys such as spark.locality.wait), which spark.conf.set cannot change
at runtime. One invocation = one JVM = one side; run alternately
(A, B, A, B ...) and compare per-query best-of medians across
invocations — the decompose_codec.py protocol generalized.

Usage:
    python tools/decompose_static_conf.py <label> "conf=value[,...]" \
        [sf_dir] [q ...]

(label "default" with an empty conf string probes the committed
session defaults.)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# floor-bound cross-section (the rows the per-query job constant
# dominates) + two mid-weight contrast rows
DEFAULT_QUERIES = [
    "q41_stratified_sample", "q31_star_exclude", "q16_doc_tokens",
    "q118_percentile_cont", "q02_brand_nodes", "q98_tpch_q6",
    "q03_latest_order", "q05_cust_order_stats", "q17_event_hourly",
    "q08_cust_no_orders", "q24_exact_dedup", "q55_event_cube",
    "q73_promo_share", "q88_tpch_q21",
]


def main() -> None:
    label = sys.argv[1]
    conf_arg = sys.argv[2] if len(sys.argv) > 2 else ""
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or DEFAULT_QUERIES
    extra = dict(kv.split("=", 1) for kv in conf_arg.split(",") if kv)

    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark(f"static_{label}", extra_conf=extra or None)
    for k in extra:
        print(f"static {label} {k} -> {spark.conf.get(k)}", flush=True)
    qs = entrymod.queries()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    total = 0.0
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
        total += min(times)
        print(f"static {label} {name}: best={min(times)} all={times}", flush=True)
    print(f"static {label} TOTAL(best)={total:.3f}", flush=True)


if __name__ == "__main__":
    main()
