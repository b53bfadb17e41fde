"""q105 prelude decomposition + two fresh A/Bs (r13 follow-up session).

The committed broadcast-regime pipeline spends its time in eager
prelude jobs that the returned frame's plan cannot show:

  1. `und` checkpoint  — lineitem self-join on l_orderkey -> canonical
                         distinct edge set (1.2M rows at sf0.1)
  2. `m = und.count()` — regime gate on the checkpointed table
  3. `adj` checkpoint  — orientation (TWO broadcast builds, each of
                         which re-runs the degree aggregation over the
                         1.2M-row `und`) + groupBy collect_list
  4. final agg         — explode(adj) |><| bcast(a2), array_intersect sum

Modes:

* ``stages`` — time each prelude job of the committed form separately
  (median-of-N per stage, one session) so the A/Bs below target the
  right stage.
* ``ab`` — interleaved A/B/A/B of three full forms, counts asserted
  equal every rep:
    - cur:     committed form (edge self-join; deg aggregated inline
               once per broadcast build).
    - grouped: edge build via groupBy(l_orderkey) + collect_set +
               posexplode/slice in-row pair generation — replaces the
               self-join (broadcast build + probe of 600K rows) with
               one narrow exchange + two Generates.  Same edge set by
               construction (pairs a<b within each order, distinct
               downstream).
    - degmat:  committed edge build, but `deg` is materialized before
               the orientation joins so the two broadcast builds scan
               ~20K checkpointed rows instead of each re-aggregating
               1.2M.  (r13 wrap session verified the duplicate build is
               real: 2 BroadcastExchange, 0 ReusedExchange.)

Usage:
    python tools/decompose_q105b.py stages [sf_dir] [reps]
    python tools/decompose_q105b.py ab [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dropbox_duckdb_playground_spark.materialize import materialize  # noqa: E402
from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402


def _edges_selfjoin(spark, sf_dir):
    from dropbox_duckdb_playground_spark.catalog import load

    l1 = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = l1.alias("l2")
    return (
        l1.alias("l1")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(F.col("l1.l_partkey").alias("src"), F.col("l2.l_partkey").alias("dst"))
    )


def _edges_grouped(spark, sf_dir):
    """One exchange on l_orderkey; pairs generated in-row from the
    per-order sorted part set (a<b by sort order, so the canonical form
    is free)."""
    from dropbox_duckdb_playground_spark.catalog import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    e1 = per_order.select("ps", F.posexplode("ps").alias("i", "src"))
    return e1.select(
        "src",
        F.explode(F.slice("ps", F.col("i") + F.lit(2), F.size("ps"))).alias("dst"),
    )


def _und(edges):
    return (
        edges.select(F.col("src").alias("x"), F.col("dst").alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )


def _deg(und):
    return (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def _oriented(und, deg):
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    return (
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


def _finish(adj) -> int:
    a2 = adj.select(F.col("u").alias("y"), F.col("nbrs").alias("ny"))
    closed = (
        adj.select(F.col("nbrs").alias("nx"), F.explode("nbrs").alias("v"))
        .join(F.broadcast(a2), F.col("v") == F.col("y"))
        .select(F.size(F.array_intersect("nx", "ny")).alias("c"))
    )
    out = closed.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles")
    )
    return out.collect()[0][0]


def _run(edges, mat_deg: bool) -> int:
    und = materialize(_und(edges))
    assert und.count() <= 4_000_000
    deg = _deg(und)
    if mat_deg:
        deg = materialize(deg)
    adj = materialize(
        _oriented(und, deg)
        .groupBy("u")
        .agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    )
    return _finish(adj)


FORMS = {
    "cur": lambda spark, sf: _run(_edges_selfjoin(spark, sf), mat_deg=False),
    "grouped": lambda spark, sf: _run(_edges_grouped(spark, sf), mat_deg=False),
    "degmat": lambda spark, sf: _run(_edges_selfjoin(spark, sf), mat_deg=True),
}


def mode_stages(spark, sf_dir: str, reps: int) -> None:
    for fn in FORMS.values():
        fn(spark, "/root/testdata/sf0.001")
        quiesce(spark)
    rows: list[dict[str, float]] = []
    for i in range(reps):
        t: dict[str, float] = {}
        t0 = time.time()
        und = materialize(_und(_edges_selfjoin(spark, sf_dir)))
        t["und_ckpt"] = time.time() - t0
        t0 = time.time()
        m = und.count()
        t["count"] = time.time() - t0
        t0 = time.time()
        adj = materialize(
            _oriented(und, _deg(und))
            .groupBy("u")
            .agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
        )
        t["adj_ckpt"] = time.time() - t0
        t0 = time.time()
        n = _finish(adj)
        t["final"] = time.time() - t0
        rows.append(t)
        print(
            f"rep{i} m={m} n={n} "
            + " ".join(f"{k}={v:.3f}s" for k, v in t.items()),
            flush=True,
        )
        quiesce(spark)
    for k in rows[0]:
        med = statistics.median(r[k] for r in rows)
        print(f"STAGE {k}: median {med:.3f}s", flush=True)


def mode_ab(spark, sf_dir: str, reps: int) -> None:
    for fn in FORMS.values():
        fn(spark, "/root/testdata/sf0.001")
        quiesce(spark)
    acc: dict[str, list[float]] = {k: [] for k in FORMS}
    counts: set[int] = set()
    for i in range(reps):
        for label, fn in FORMS.items():
            t0 = time.time()
            n = fn(spark, sf_dir)
            dt = round(time.time() - t0, 3)
            acc[label].append(dt)
            counts.add(n)
            print(f"rep{i} {label}: {dt}s n_triangles={n}", flush=True)
            quiesce(spark)
    assert len(counts) == 1, f"count mismatch: {counts}"
    meds = {k: statistics.median(v) for k, v in acc.items()}
    base = meds["cur"]
    for k, v in meds.items():
        print(
            f"MEDIAN {k}: {v:.3f}s ({(base - v) / base * 100:+.1f}% vs cur)",
            flush=True,
        )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("decompose_q105b")
    if mode == "stages":
        mode_stages(spark, sf_dir, reps)
    elif mode == "ab":
        mode_ab(spark, sf_dir, reps)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
