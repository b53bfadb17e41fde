"""q73_promo_share A/B: group key = date_format(l_shipdate,'yyyy-MM')
string (r7 committed form) vs (year, month) int pair formatted on the
~84 output rows (r13).

Both forms share the broadcast part join and the exact integer-unit
money math; they differ only in WHERE the 'yyyy-MM' string is built:

- OLD: date_format renders a string per FACT row (a DateTimeFormatter
  call each), and the aggregation hashes/shuffles that string key.
- NEW: groupBy(year(l_shipdate), month(l_shipdate)) — two plain field
  extractions, int exchange key — and concat_ws/lpad formats only the
  output rows. Identical strings (4-digit years, zero-padded months).

Interleaved A/B (old, new, old, new, ...) in ONE session, timed to the
noop sink, median-of-N, full 84-row results asserted equal each rep.
Usage: python tools/decompose_q73.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402


def old_form(spark, sf_dir):
    from dropbox_duckdb_playground_spark.catalog import load

    p = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_type"))
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4)
            .cast("double")
            .alias("promo_share_pct")
        )
    )


def new_form(spark, sf_dir):
    from dropbox_duckdb_playground_spark.catalog import q73_promo_share

    return q73_promo_share(spark, sf_dir)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("decompose_q73")
    for fn in (old_form, new_form):
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        quiesce(spark)
    olds, news = [], []
    for i in range(reps):
        for label, fn, acc in (("old", old_form, olds), ("new", new_form, news)):
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            rows = tuple(sorted(map(tuple, df.collect())))
            acc.append((dt, rows))
            print(f"rep{i} {label}: {dt}s rows={len(rows)}", flush=True)
            quiesce(spark)
    results = {r for _, r in olds} | {r for _, r in news}
    assert len(results) == 1, "result mismatch between forms"
    mo = statistics.median([t for t, _ in olds])
    mn = statistics.median([t for t, _ in news])
    print(
        f"MEDIANS old={mo:.3f}s new={mn:.3f}s delta={mo - mn:+.3f}s "
        f"({(mo - mn) / mo * 100:+.1f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
