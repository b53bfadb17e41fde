"""Generic runtime-conf A/B over catalog queries, interleaved in ONE
session (same JVM, same warm state): for each query, alternating reps
with the conf(s) at the committed default (OFF) and at the probe value
(ON); median per side. Only runtime-settable SQL confs can be probed
this way — static confs (e.g. spark.io.compression.codec) need the
per-JVM protocol of tools/decompose_codec.py instead.

Usage:
    python tools/decompose_conf.py "conf=value[,conf=value...]" \
        [sf_dir] [reps] [q ...]

Example (AQE coalescing honoring advisory size over parallelism-first,
guide §2.2):
    python tools/decompose_conf.py \
        spark.sql.adaptive.coalescePartitions.parallelismFirst=false
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# default probe set: a cross-section of plan shapes — broadcast-join agg
# (q73), deep multi-stage TPC-H (q88/q51/q102), window-heavy text (q42),
# holistic aggregate (q57), ER/self-join (q34), sketch spine (q93),
# frontier joins (q109), grouping sets (q112), JSON explode (q15),
# iterative graph (q92, q29).
DEFAULT_QUERIES = [
    "q73_promo_share",
    "q88_tpch_q21",
    "q51_tpch_q3",
    "q102_tpch_q11",
    "q42_winnow_fp",
    "q57_group_median",
    "q34_er_doc_clusters",
    "q93_hll_distinct",
    "q109_khop_reach",
    "q112_grouping_sets",
    "q15_event_kv",
    "q92_pagerank",
    "q29_components",
]


def main() -> None:
    pairs = [kv.split("=", 1) for kv in sys.argv[1].split(",")]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names = sys.argv[4:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("decompose_conf")
    qs = entrymod.queries()
    defaults = {k: spark.conf.get(k, None) for k, _ in pairs}
    print(f"probe: {pairs} (defaults {defaults})", flush=True)

    def set_side(on: bool) -> None:
        for k, v in pairs:
            if on:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    totals = {"off": 0.0, "on": 0.0}
    for name in names:
        fn = qs[name]
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        quiesce(spark)
        sides = {"off": [], "on": []}
        for _ in range(reps):
            for side in ("off", "on"):
                set_side(side == "on")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                sides[side].append(round(time.time() - t0, 3))
                quiesce(spark)
        set_side(False)
        mo = statistics.median(sides["off"])
        mn = statistics.median(sides["on"])
        totals["off"] += mo
        totals["on"] += mn
        print(
            f"CONF {name}: off={mo:.3f} on={mn:.3f} delta={mo - mn:+.3f} "
            f"(off reps {sides['off']}, on reps {sides['on']})",
            flush=True,
        )
    print(
        f"TOTALS off={totals['off']:.2f}s on={totals['on']:.2f}s "
        f"delta={totals['off'] - totals['on']:+.2f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
