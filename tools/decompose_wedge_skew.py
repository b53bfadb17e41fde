"""Wedge-regime skew adjudication at sf1 (VERDICT r13 #6, guide §2.5).

triangle_count's shuffle regime partitions the wedge join ``e1 ⋈ e2 ON
u`` by the wedge CENTER u. On a power-law graph the orientation bounds
every center's out-degree at O(sqrt(m)), so the hottest u contributes
at most ~d_max^2/2 wedges — but "bounded by design" still needs the
measured distribution behind it. This probe builds q105's sf1 oriented
edge set with the REAL operator code path, then reports:

  - m, sqrt(m), max/p99 oriented out-degree vs the sqrt(m) bound
  - wedges per center: total, max, p99 (d*(d-1)/2 over out-degrees)
  - per-REDUCE-PARTITION wedge rows at the bench partitioning
    (pmod(hash(u), shuffle.partitions)): max vs median — the exact
    skew statistic AQE's skew-join split looks at (factor-5 x median
    AND 256MB; wedge rows are 16B of ints, so bytes = rows * ~16)

Usage: python tools/decompose_wedge_skew.py [sf1_dir]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata_sf1")
    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.materialize import materialize
    from dropbox_duckdb_playground_spark.session import get_spark

    spark = get_spark("wedge_skew")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # q105's edge derivation + triangle_count's canonicalization and
    # orientation, verbatim shapes (operators/components.py)
    l1 = load(spark, sf1, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        l1.alias("l1")
        .join(
            l1.alias("l2"),
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(
            F.col("l1.l_partkey").alias("src"), F.col("l2.l_partkey").alias("dst")
        )
    )
    und = materialize(
        edges.select(F.col("src").alias("x"), F.col("dst").alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    m = und.count()
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    outdeg = materialize(
        oriented.groupBy("u").agg(F.count("*").alias("d"))
    )
    wedges = outdeg.select(
        "u", "d", (F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("wdg")
    )
    stats = wedges.agg(
        F.max("d").alias("d_max"),
        F.expr("percentile(d, 0.99)").alias("d_p99"),
        F.sum("wdg").alias("w_total"),
        F.max("wdg").alias("w_max"),
        F.expr("percentile(wdg, 0.99)").alias("w_p99"),
    ).collect()[0]
    part = (
        wedges.groupBy(F.pmod(F.hash("u"), F.lit(n_part)).alias("p"))
        .agg(F.sum("wdg").alias("rows"))
    )
    pstats = part.agg(
        F.count("*").alias("n_parts"),
        F.max("rows").alias("rows_max"),
        F.expr("percentile(rows, 0.5)").alias("rows_med"),
    ).collect()[0]
    print(f"m={m} sqrt(m)={math.isqrt(m)}")
    print(
        f"out-degree: max={stats['d_max']} p99={stats['d_p99']:.0f} "
        f"(orientation bound ~sqrt(2m)={math.isqrt(2 * m)})"
    )
    print(
        f"wedges: total={stats['w_total']} max-per-center={stats['w_max']}"
        f" p99-per-center={stats['w_p99']:.0f}"
    )
    ratio = pstats["rows_max"] / max(pstats["rows_med"], 1)
    print(
        f"reduce partitions (n={pstats['n_parts']}/{n_part}): "
        f"max={pstats['rows_max']} median={pstats['rows_med']:.0f} "
        f"max/median={ratio:.2f} "
        f"max-bytes~={pstats['rows_max'] * 16 / 1e6:.1f}MB "
        f"(AQE skew split: >5x median AND >256MB)"
    )


if __name__ == "__main__":
    main()
