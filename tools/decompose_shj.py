"""Runtime-conf A/B: AQE sort-merge -> shuffled-hash join conversion.

Guide §3.1: `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`
(default 0 = off) lets AQE rewrite a sort-merge join to a shuffled-hash
join at runtime when EVERY post-shuffle partition of the build side is
below the threshold — the size-gated, spill-aware way to skip SMJ's
sorts, unlike a blanket `preferSortMergeJoin=false` (which this repo's
operators deliberately avoid on uncapped self-joins for spill safety).
Because the gate looks at observed partition sizes, the local win
carries to a cluster unchanged: partitions that outgrow the threshold
keep sort-merge and its graceful spill.

Both knobs are runtime-settable SQL confs, so the A/B interleaves in
ONE session (same JVM, same warm state): for each query, alternating
reps with the conf OFF (committed default) and ON, median per side.

Usage: python tools/decompose_shj.py [sf_dir] [threshold] [reps] [q ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# default probe set: the catalog rows whose plans carry SMJs (self-join
# miners keep explicit merge hints; TPC-H fact joins pick SMJ past the
# broadcast threshold) plus a few no-join controls.
DEFAULT_QUERIES = [
    "q25_minhash_pairs",
    "q26_jaccard_pairs",
    "q35_hamming_pairs",
    "q38_cosine_neardup",
    "q64_jaccard_capped",
    "q65_lsh_capped",
    "q67_minhash_estimate",
    "q34_er_doc_clusters",
    "q47_neardup_survivors",
    "q88_tpch_q21",
    "q102_tpch_q11",
    "q51_tpch_q3",
    "q57_group_median",  # control: no join
    "q42_winnow_fp",  # control: no join
]

CONF = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = sys.argv[2] if len(sys.argv) > 2 else "128m"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names = sys.argv[4:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("decompose_shj")
    qs = entrymod.queries()
    base = spark.conf.get(CONF, "0")
    print(f"baseline {CONF}={base}; ON={threshold}", flush=True)

    totals = {"off": 0.0, "on": 0.0}
    for name in names:
        fn = qs[name]
        for _ in range(1):  # warm
            try:
                fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
            quiesce(spark)
        sides = {"off": [], "on": []}
        for r in range(reps):
            for side in ("off", "on"):
                spark.conf.set(CONF, threshold if side == "on" else "0")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                sides[side].append(round(time.time() - t0, 3))
                quiesce(spark)
        spark.conf.set(CONF, "0")
        mo = statistics.median(sides["off"])
        mn = statistics.median(sides["on"])
        totals["off"] += mo
        totals["on"] += mn
        print(
            f"SHJ {name}: off={mo:.3f} on={mn:.3f} delta={mo - mn:+.3f} "
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
