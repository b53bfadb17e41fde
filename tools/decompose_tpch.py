"""tpch-relational family decomposition (r11): q101/q102/q103.

RATIO.md has named this family the worst data-time ratio since r8
(2.50x in the r9-derived table, 3.27x from the r10 driver run) and the
r10 verdict made its decomposition the round's main perf task. The
three worst rows by data time are the modeled-partsupp TPC-H shapes:

  q103_tpch_q20  (5.6x in the r10 driver run)
  q101_tpch_q2   (4.2x)
  q102_tpch_q11  (3.7x)

All three synthesize partsupp from lineitem (_ps_spark: project two
key columns -> DISTINCT -> md5-derive cost/qty), so the suspects are:

  (a) the ps DISTINCT exchange running on UNPRUNED pairs when a
      selective dimension filter exists (q101 filters part to
      mid-size LARGE, q102 filters suppliers to region 2 — neither is
      pushed below the distinct in the committed forms);
  (b) q103 scanning lineitem TWICE (once for ps, once for the 1997
      shipped aggregate) and then merge-joining the two aggregates —
      when one conditional aggregate over the widget-filtered scan
      produces both in a single shuffle;
  (c) q101's window-min adding an exchange+sort by ps_partkey after
      the (partkey,suppkey)-keyed distinct.

Forms per query (fingerprint-checked equal before any timing; the
committed oracle answers these shapes at sf0.01 via tools/check.py):

  q103: A committed (2 scans + merge join)
        B fused single-scan conditional aggregate
  q101: A committed (unpruned ps + window min)
        B part-filter pushed below the distinct (window min kept)
        C part-filter pushed + groupBy-min + broadcast join back
  q102: A committed (unpruned ps)
        B supplier-filter pushed below the distinct

Stage attribution first (timed sub-plans of the committed form), then
interleaved same-session A/B reps, median printed per form.

Usage: python tools/decompose_tpch.py [sf_dir] [reps] [q101|q102|q103 ...]
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


# Form A bodies are INLINE copies of the pre-r11 committed forms (not
# catalog calls): the catalog adopted the winning B forms this round,
# so calling it would compare B against itself on a rerun.

# --------------------------------------------------------------- q103
def q103_a(spark, sf_dir):
    """Pre-r11 committed: two lineitem scans (ps distinct + 1997 agg)
    merge-joined on (partkey, suppkey)."""
    p = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    ps = C._ps_spark(spark, sf_dir, part_filter=p)
    shipped = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_c"))
    )
    excess = (
        ps.join(
            shipped.hint("merge"),
            (ps["ps_partkey"] == shipped["l_partkey"])
            & (ps["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .filter(F.lit(200) * F.col("ps_availqty") > F.col("qty_c"))
        .select("ps_suppkey")
        .distinct()
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(excess), F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


def q103_b(spark, sf_dir):
    """Fused: ONE widget-filtered lineitem scan, ONE (partkey,suppkey)
    shuffle producing the distinct pair, the md5-derived availqty AND
    the 1997 shipped sum together. The inner join with `shipped`
    restricts to pairs that shipped in 1997 -> `qty_c IS NOT NULL`."""
    p = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    qkey = C.SPARK_ID.format(
        x="CAST(l_suppkey AS STRING) || ':' || CAST(l_partkey AS STRING)"
    )
    in97 = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(in97, F.round(F.col("l_quantity") * 100).cast("long"))
            ).alias("qty_c")
        )
        .filter(F.col("qty_c").isNotNull())
        .select(
            F.col("l_suppkey").alias("ps_suppkey"),
            (
                F.lit(1) + F.expr(qkey) % 9999
            ).cast("int").alias("ps_availqty"),
            "qty_c",
        )
    )
    excess = (
        pairs.filter(F.lit(200) * F.col("ps_availqty") > F.col("qty_c"))
        .select("ps_suppkey")
        .distinct()
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(excess), F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


# --------------------------------------------------------------- q101
def _q101_parts(spark, sf_dir):
    return F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


def _q101_supps(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return F.broadcast(
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


def _q101_regional(spark, sf_dir, pushed: bool):
    p = _q101_parts(spark, sf_dir)
    s = _q101_supps(spark, sf_dir)
    ps = C._ps_spark(spark, sf_dir, part_filter=p if pushed else None)
    return (
        ps.join(p, ps["ps_partkey"] == p["p_partkey"])
        .join(s, ps["ps_suppkey"] == s["s_suppkey"])
        .select(
            "ps_partkey", "s_name", "s_acctbal", "nation", "p_name",
            (
                F.col("p_retailprice") * (F.lit(5000) + F.col("__cost_k"))
                / F.lit(100000.0)
            ).alias("supplycost"),
        )
    )


def _q101_out(df):
    return df.select(
        "s_acctbal", "s_name", "nation",
        F.col("ps_partkey").alias("p_partkey"), "p_name",
        F.round("supplycost", 2).alias("supplycost"),
    )


def q101_a(spark, sf_dir):
    """Pre-r11 committed: UNPRUNED ps distinct + window min."""
    regional = _q101_regional(spark, sf_dir, pushed=False)
    w = Window.partitionBy("ps_partkey")
    return _q101_out(
        regional.withColumn("__min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("__min_cost"))
    )


def q101_b(spark, sf_dir):
    regional = _q101_regional(spark, sf_dir, pushed=True)
    w = Window.partitionBy("ps_partkey")
    return _q101_out(
        regional.withColumn("__min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("__min_cost"))
    )


def q101_c(spark, sf_dir):
    regional = _q101_regional(spark, sf_dir, pushed=True)
    m = F.broadcast(
        regional.groupBy("ps_partkey").agg(F.min("supplycost").alias("__min_cost"))
    )
    return _q101_out(
        regional.withColumnRenamed("ps_partkey", "k")
        .join(
            m,
            (F.col("k") == m["ps_partkey"])
            & (F.col("supplycost") == F.col("__min_cost")),
        )
        .drop("k")
    )


# --------------------------------------------------------------- q102
def q102_a(spark, sf_dir):
    """Pre-r11 committed: UNPRUNED ps distinct (supplier filter applied
    only after the md5 derivations)."""
    ps = C._ps_spark(spark, sf_dir)
    p = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_retailprice"))
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    s = F.broadcast(
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    val = (
        ps.join(p, ps["ps_partkey"] == p["p_partkey"])
        .join(s, ps["ps_suppkey"] == s["s_suppkey"])
        .select(
            "ps_partkey",
            (
                (
                    F.col("p_retailprice")
                    * (F.lit(5000) + F.col("__cost_k"))
                    / F.lit(100000.0)
                ).cast("decimal(18,6)")
                * F.col("ps_availqty")
            ).alias("v"),
        )
    )
    agg = val.groupBy("ps_partkey").agg(F.sum("v").alias("pv"))
    tot = agg.agg(F.sum("pv").alias("t"), F.count("*").alias("n"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .filter(
            F.col("pv").cast("double") > F.col("t").cast("double") / F.col("n") * 1.1
        )
        .select("ps_partkey", F.round("pv", 2).cast("double").alias("value"))
    )


def q102_b(spark, sf_dir):
    """Region-2 supplier filter pushed BELOW the ps distinct: the pair
    projection joins the broadcast supplier list first, so the distinct
    exchange and the md5 derivations run on ~1/5 of the pairs."""
    p = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_retailprice"))
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    s = F.broadcast(
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    key = C.SPARK_ID.format(
        x="CAST(l_partkey AS STRING) || ':' || CAST(l_suppkey AS STRING)"
    )
    qkey = C.SPARK_ID.format(
        x="CAST(l_suppkey AS STRING) || ':' || CAST(l_partkey AS STRING)"
    )
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (F.expr(key) % 5000).alias("__cost_k"),
            (F.lit(1) + F.expr(qkey) % 9999).cast("int").alias("ps_availqty"),
        )
    )
    val = ps.join(p, ps["ps_partkey"] == p["p_partkey"]).select(
        "ps_partkey",
        (
            (
                F.col("p_retailprice") * (F.lit(5000) + F.col("__cost_k"))
                / F.lit(100000.0)
            ).cast("decimal(18,6)")
            * F.col("ps_availqty")
        ).alias("v"),
    )
    agg = val.groupBy("ps_partkey").agg(F.sum("v").alias("pv"))
    tot = agg.agg(F.sum("pv").alias("t"), F.count("*").alias("n"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .filter(
            F.col("pv").cast("double") > F.col("t").cast("double") / F.col("n") * 1.1
        )
        .select("ps_partkey", F.round("pv", 2).cast("double").alias("value"))
    )


FORMS = {
    "q101": {"A_committed": q101_a, "B_pushed_window": q101_b, "C_pushed_aggjoin": q101_c},
    "q102": {"A_committed": q102_a, "B_pushed_distinct": q102_b},
    "q103": {"A_committed": q103_a, "B_fused_scan": q103_b},
}

# Order-insensitive fingerprints per query: count + exact sums of key
# columns (doubles summed as scaled longs so float addition order can't
# produce a false mismatch — the r10 lesson).
FPRINT = {
    "q101": lambda df: df.agg(
        F.count("*"),
        F.sum(F.col("p_partkey")),
        F.sum((F.col("supplycost") * 100).cast("long")),
        F.sum((F.col("s_acctbal") * 100).cast("long")),
    ),
    "q102": lambda df: df.agg(
        F.count("*"),
        F.sum(F.col("ps_partkey")),
        F.sum((F.col("value") * 100).cast("long")),
    ),
    "q103": lambda df: df.agg(
        F.count("*"),
        F.sum((F.col("s_acctbal") * 100).cast("long")),
        F.sum(F.length("s_name")),
    ),
}


def stage_attribution(spark, sf_dir):
    """Timed sub-plans of the COMMITTED forms: where do the seconds go?"""
    print(f"\n== stage attribution (committed forms) at {sf_dir} ==", flush=True)

    def t(label, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {label}: {time.time() - t0:.3f}s", flush=True)
        quiesce(spark)

    li = load(spark, sf_dir, "lineitem")
    t("lineitem scan (2 key cols)", li.select("l_partkey", "l_suppkey"))
    t("pairs distinct (no md5)",
      li.select("l_partkey", "l_suppkey").distinct())
    t("ps full (_ps_spark, distinct + md5)", C._ps_spark(spark, sf_dir))
    wid = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%")).select("p_partkey"))
    t("ps widget-filtered (q103 committed)",
      C._ps_spark(spark, sf_dir, part_filter=wid))
    t("shipped 1997 agg (q103 committed)",
      li.filter((F.col("l_shipdate") >= "1997-01-01")
                & (F.col("l_shipdate") < "1998-01-01"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q")))
    t("q101 regional join (unpruned ps)",
      _q101_regional(spark, sf_dir, pushed=False))
    t("q101 regional join (pushed ps)",
      _q101_regional(spark, sf_dir, pushed=True))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = int(args.pop(0)) if args and args[0].isdigit() else 3
    targets = [a for a in args if a in FORMS] or list(FORMS)

    spark = get_spark("tpchdecomp")
    spark.sparkContext.setLogLevel("ERROR")
    stage_attribution(spark, sf_dir)

    rc = 0
    for q in targets:
        forms = FORMS[q]
        fps = {}
        for name, fn in forms.items():
            fps[name] = tuple(FPRINT[q](fn(spark, sf_dir)).collect()[0])
            quiesce(spark)
        base = next(iter(fps.values()))
        print(f"\n== {q} ==", flush=True)
        for name, fp in fps.items():
            tag = "OK" if fp == base else "MISMATCH"
            print(f"  fingerprint {name}: {fp} {tag}", flush=True)
        if any(fp != base for fp in fps.values()):
            print(f"  ABORT {q}: forms disagree — timing untrustworthy")
            rc = 1
            continue
        times: dict[str, list[float]] = {n: [] for n in forms}
        for _ in range(reps):
            for name, fn in forms.items():
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[name].append(time.time() - t0)
                quiesce(spark)
        for name, ts in times.items():
            print(
                f"  {name}: median {statistics.median(ts):.3f}s "
                f"reps {[round(x, 3) for x in ts]}",
                flush=True,
            )
    print(f"\nloadavg {os.getloadavg()[0]:.2f}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
