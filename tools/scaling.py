"""Scaling-curve measurement: every catalog query at sf0.001 / 0.01 /
0.1, best-of-2 steady-state, with a growth classification.

The question the curve answers is the 100 TB one: as data grows 10x,
does the query's wall time stay flat (fixed scheduling/sync overhead
dominates — it will scale until data swamps the constant), grow ~
linearly (healthy: cost is proportional work), or grow superlinearly
(a pair-explosion or spill — it will NOT survive further scale-up)?

slope10 = t(sf0.1) / t(sf0.01) — i.e. the cost multiplier for the last
10x of data. Classification: overhead-bound (< 2), sublinear (< 8),
linear (8-15), superlinear (> 15).

Usage: python tools/scaling.py [out_md]   (writes SCALING.md)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def classify(slope: float) -> str:
    if slope < 2.0:
        return "overhead-bound"
    if slope < 8.0:
        return "sublinear"
    if slope <= 15.0:
        return "linear"
    return "SUPERLINEAR"


def main() -> int:
    out_md = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALING.md")

    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # JIT/codegen warmup on the smallest sf
    for fn in qs.values():
        try:
            fn(spark, SFS[0]).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        quiesce(spark)

    results: dict[str, list[float]] = {}
    for sf in SFS:
        for name, fn in qs.items():
            best = -1.0
            for _ in range(2):
                t0 = time.time()
                try:
                    fn(spark, sf).write.format("noop").mode("overwrite").save()
                    dt = time.time() - t0
                    best = dt if best < 0 else min(best, dt)
                except Exception as exc:
                    sys.stderr.write(f"scaling: {name}@{sf}: {exc}\n")
                    break
                quiesce(spark)
            results.setdefault(name, []).append(round(best, 3))

    lines = [
        "# SCALING — measured growth of every query across 100x of data",
        "",
        "Best-of-2 steady-state seconds per scale factor"
        " (`tools/scaling.py`, local[32]). `slope10` = t(sf0.1)/t(sf0.01):",
        "the wall-cost multiplier for the last 10x of data. A query whose",
        "slope is far below 10 is still overhead-dominated at this scale —",
        "flat cost it amortizes at 100 TB; near 10 is linear in data;",
        "well above 10 means pair explosion or spill and would NOT",
        "survive scale-up.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | slope10 | class |",
        "|---|---|---|---|---|---|",
    ]
    n_super = 0
    for name, ts in results.items():
        if len(ts) == 3 and ts[1] > 0 and ts[2] > 0:
            slope = ts[2] / ts[1]
            cls = classify(slope)
            n_super += cls == "SUPERLINEAR"
            lines.append(
                f"| {name} | {ts[0]:.2f} | {ts[1]:.2f} | {ts[2]:.2f} |"
                f" {slope:.2f} | {cls} |"
            )
        else:
            lines.append(f"| {name} | {ts} | | | | error |")
            n_super += 1
    lines += [
        "",
        f"**Superlinear/error count: {n_super}.**",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}: {len(results)} queries, {n_super} superlinear")
    return 1 if n_super else 0


if __name__ == "__main__":
    raise SystemExit(main())
