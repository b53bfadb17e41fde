"""Per-query floor decomposition (r14, guide §1): for each query, split
the bench-visible time into BUILD (the Python ``queries()[name](spark,
sf_dir)`` call: py4j plan construction + eager prelude jobs) and EXEC
(the noop-sink write), and count the Spark JOBS and STAGES each part
launches via the DAGScheduler's monotonically increasing id counters.

The floor (~0.23s/query on the driver host, ~30% of bench wall) is a
sum of per-job constants — job submission, AQE stage materialization,
task-wave launch, noop commit — so the job/stage counts say WHERE the
per-query constant lives and which rows pay more jobs than their plan
shape needs.

Usage: python tools/decompose_floor14.py [sf_dir] [q ...]
       (default: the 25 oracle-cheapest floor rows from RATIO.md)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Floor-bound rows (sub-second on every host, oracle ~ms): the rows the
# per-query constant dominates. A few mid-weight rows are appended for
# contrast (their exec should dwarf the floor).
DEFAULT_QUERIES = [
    "q41_stratified_sample", "q31_star_exclude", "q16_doc_tokens",
    "q118_percentile_cont", "q02_brand_nodes", "q12_union_all_tagged",
    "q69_frame_plan", "q10_id_remap", "q13_cust_rank", "q23_fingerprint",
    "q81_stratified_sample", "q40_scrub_pii", "q98_tpch_q6",
    "q11_union_nations", "q19_event_pivot", "q07_exists_orders",
    "q24_exact_dedup", "q08_cust_no_orders", "q30_rollup",
    "q55_event_cube", "q17_event_hourly", "q04_best_order",
    "q05_cust_order_stats", "q20_token_stats", "q03_latest_order",
    # contrast rows
    "q73_promo_share", "q42_winnow_fp", "q57_group_median",
]


def counters(spark):
    sc = spark.sparkContext._jsc.sc()
    # py4j auto-unboxes AtomicInteger.get-less calls differently across
    # versions: nextJobId() may come back as the AtomicInteger or the int.
    j = sc.dagScheduler().nextJobId()
    if not isinstance(j, int):
        j = j.get()
    s = sc.nextShuffleId()
    if not isinstance(s, int):
        s = s.get()
    return j, s


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("floor14")
    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    rows = []
    for name in names:
        fn = qs[name]
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        quiesce(spark)
        best = None
        for _ in range(reps):
            j0, s0 = counters(spark)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            j1, s1 = counters(spark)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2, s2 = counters(spark)
            rec = dict(
                build=round(t1 - t0, 3), exec=round(t2 - t1, 3),
                total=round(t2 - t0, 3),
                build_jobs=j1 - j0, exec_jobs=j2 - j1,
                build_shuf=s1 - s0, exec_shuf=s2 - s1,
            )
            if best is None or rec["total"] < best["total"]:
                best = rec
            quiesce(spark)
        print(
            f"{name}: build={best['build']} exec={best['exec']} "
            f"total={best['total']} jobs(b/e)={best['build_jobs']}/"
            f"{best['exec_jobs']} shuffles(b/e)={best['build_shuf']}/"
            f"{best['exec_shuf']}",
            flush=True,
        )
        rows.append((name, best))
    tb = sum(r[1]["build"] for r in rows)
    te = sum(r[1]["exec"] for r in rows)
    tj = sum(r[1]["build_jobs"] + r[1]["exec_jobs"] for r in rows)
    print(f"TOTAL build={tb:.2f}s exec={te:.2f}s jobs={tj}", flush=True)


if __name__ == "__main__":
    main()
