"""q105 broadcast-regime A/B: oriented-checkpoint + two broadcast joins
(r9 committed form) vs adjacency-explode + one broadcast join (r13).

Both forms share the catalog's co-purchase edge build and the
orientation pipeline; they differ only downstream of `oriented`:

- OLD: materialize(oriented); gate on oriented.count(); adj checkpoint;
  closed = oriented ⋈ bcast(a1 on u) ⋈ bcast(a2 on v).
- NEW: gate on und.count() (orientation is a bijection, same number);
  oriented stays lazy (single consumer); adj checkpoint; closed =
  explode(adj) ⋈ bcast(a2 on v) — the a1 join was row-wise a no-op
  (every oriented edge's tail has >=1 out-edge: itself), so the explode
  recovers (u, v, nx) without the broadcast build/probe, and one
  checkpoint write+read of the full edge list disappears.

Interleaved A/B (old, new, old, new, ...) in ONE session, median-of-N,
counts asserted equal each rep. Usage:
    python tools/decompose_q105.py [sf_dir] [reps]
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


def _edges(spark, sf_dir):
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


def _prefix(edges):
    """Shared prelude: canonical undirected edge set + orientation."""
    und = (
        edges.select(F.col("src").alias("x"), F.col("dst").alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    und = materialize(und)
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
    return und, oriented


def old_form(edges) -> int:
    und, oriented = _prefix(edges)
    oriented = materialize(oriented)
    assert oriented.count() <= 4_000_000
    adj = materialize(
        oriented.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    )
    a1 = adj.select(F.col("u").alias("x"), F.col("nbrs").alias("nx"))
    a2 = adj.select(F.col("u").alias("y"), F.col("nbrs").alias("ny"))
    closed = (
        oriented.join(F.broadcast(a1), F.col("u") == F.col("x"))
        .join(F.broadcast(a2), F.col("v") == F.col("y"))
        .select(F.size(F.array_intersect("nx", "ny")).alias("c"))
    )
    out = closed.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles")
    )
    return out.collect()[0][0]


def new_form(edges) -> int:
    und, oriented = _prefix(edges)
    assert und.count() <= 4_000_000
    adj = materialize(
        oriented.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    )
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("decompose_q105")
    # warm both shapes on sf0.001
    for fn in (old_form, new_form):
        fn(_edges(spark, "/root/testdata/sf0.001"))
        quiesce(spark)
    olds, news = [], []
    for i in range(reps):
        for label, fn, acc in (("old", old_form, olds), ("new", new_form, news)):
            t0 = time.time()
            n = fn(_edges(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            acc.append((dt, n))
            print(f"rep{i} {label}: {dt}s n_triangles={n}", flush=True)
            quiesce(spark)
    counts = {n for _, n in olds} | {n for _, n in news}
    assert len(counts) == 1, f"count mismatch: {counts}"
    mo = statistics.median([t for t, _ in olds])
    mn = statistics.median([t for t, _ in news])
    print(
        f"MEDIANS old={mo:.3f}s new={mn:.3f}s delta={mo - mn:+.3f}s "
        f"({(mo - mn) / mo * 100:+.1f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
