"""q57_group_median decomposition (r11).

The last >2x sf1 row without a NAMED decomposition. Stage attribution
at sf0.1 (this file's --attr mode prints it): scan 0.37s, count-agg
0.66s, percentile(quantity) 0.45s, percentile(price) 1.22s, full
1.42s — the cost is the exact `percentile` on the HIGH-CARDINALITY
price column: Spark's Percentile is an ObjectHashAggregate whose
partial state is a per-group OpenHashMap<value,count>; on a column
with ~|rows| distinct values the partial maps are input-sized, row-
at-a-time (no codegen), and the final merge concentrates 32 of them
into a handful of groups.

Form B replaces the holistic aggregate with relational algebra that
keeps every stage codegen'd and bounded:

  counts  = groupBy(keys, value).count()          -- HashAggregate
  cum     = window cumsum over value per key      -- positions [lo,hi]
  n       = per-key total (tiny, broadcast back)
  pos     = p*(n-1) (0-based);  result = v_floor + frac*(v_ceil - v_floor)
  pick the two straddling rows with a conditional aggregate

Same interpolation formula as Spark's Percentile and DuckDB's
quantile_cont. The 100 TB argument is stronger than the local one:
B's state is the distinct-value count table (spillable, shuffle-
bounded), while A's partial maps grow with per-partition distinct
count and live on the ObjectHashAggregate's unspillable fallback
path — B survives cardinalities A cannot.

Usage: python tools/decompose_q57.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dropbox_duckdb_playground_spark import catalog as C  # noqa: E402
from dropbox_duckdb_playground_spark.catalog import load  # noqa: E402
from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402

KEYS = ["l_returnflag", "l_linestatus"]


def q57_a(spark, sf_dir):
    """Committed: exact percentile (holistic ObjectHashAggregate)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(*KEYS).agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
    )


def _quantile_via_counts(df, value_col: str, p: float, out: str):
    """Exact interpolated quantile of ``value_col`` per KEYS via a
    count table + cumulative positions. Returns (keys..., out)."""
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*KEYS, value_col)
        .agg(F.count("*").alias("__c__"))
    )
    w = Window.partitionBy(*KEYS).orderBy(value_col)
    cum = counts.withColumn("__hi__", F.sum("__c__").over(w)).withColumn(
        "__lo__", F.col("__hi__") - F.col("__c__") + 1
    )
    tot = cum.groupBy(*KEYS).agg(F.max("__hi__").alias("__n__"))
    pos = F.lit(p) * (F.col("__n__") - 1)  # 0-based, double
    tf = F.floor(pos) + 1  # 1-based straddle positions
    tc = F.ceil(pos) + 1
    joined = cum.join(F.broadcast(tot), KEYS)
    picked = joined.groupBy(*KEYS).agg(
        F.max(
            F.when(
                (F.col("__lo__") <= tf) & (tf <= F.col("__hi__")),
                F.col(value_col),
            )
        ).alias("__vl__"),
        F.max(
            F.when(
                (F.col("__lo__") <= tc) & (tc <= F.col("__hi__")),
                F.col(value_col),
            )
        ).alias("__vh__"),
        F.max(pos - F.floor(pos)).alias("__frac__"),
    )
    return picked.select(
        *KEYS,
        (
            F.col("__vl__") + F.col("__frac__") * (F.col("__vh__") - F.col("__vl__"))
        ).alias(out),
    )


def q57_b(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    med = _quantile_via_counts(li, "l_quantity", 0.5, "median_qty")
    p90 = _quantile_via_counts(li, "l_extendedprice", 0.9, "p90_price")
    return med.join(p90, KEYS).select(
        *KEYS,
        F.round("median_qty", 4).alias("median_qty"),
        F.round("p90_price", 4).alias("p90_price"),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("q57probe")
    spark.sparkContext.setLogLevel("ERROR")
    forms = {"A_percentile": q57_a, "B_count_cumsum": q57_b}
    fps = {}
    for name, fn in forms.items():
        rows = sorted(
            tuple(r) for r in fn(spark, sf_dir).collect()
        )
        fps[name] = rows
        quiesce(spark)
    base = next(iter(fps.values()))
    for name, fp in fps.items():
        tag = "OK" if fp == base else "MISMATCH"
        print(f"fingerprint {name}: {fp[:2]}... {tag}", flush=True)
    if any(fp != base for fp in fps.values()):
        print("ABORT: forms disagree")
        for name, fp in fps.items():
            print(name, fp)
        return 1
    times: dict[str, list[float]] = {n: [] for n in forms}
    for _ in range(reps):
        for name, fn in forms.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
            quiesce(spark)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}s "
            f"reps {[round(x, 3) for x in ts]}",
            flush=True,
        )
    print(f"loadavg {os.getloadavg()[0]:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
