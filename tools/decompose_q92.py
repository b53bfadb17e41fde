"""q92_pagerank prelude launch-floor probe (r12).

The r11 verdict asked whether the q62/q107 concurrent-staging pattern
generalizes to q92's prelude: the committed pagerank() runs THREE
serial driver-blocking actions before the (single-action) unrolled
iteration plan — materialize(edges.distinct()), materialize(nodes ⋈
deg), and n.count(). The count is derivable from an INDEPENDENT job
(nodes.distinct().count() — the deg join is key-unique LEFT, so row
count is preserved), which can overlap the edge materialize.

  A committed prelude, inlined (3 serial actions) — inlined, not a
    catalog call, so adopting B cannot silently turn reruns into B-vs-B
    (r11 lesson recorded in the round protocols memory).
  B concurrent phase 1: [materialize(e), n_nodes=nodes.distinct().count()]
    on two InheritableThreads, then ONE serial materialize(n).
    (2 serial phases instead of 3; the count job recomputes the small
    nodes-distinct, overlapped under the o⋈l edge materialize.)
  C = B, but the node table is NOT eagerly materialized: n.persist()
    fills inside round 1's action (one fewer serial job; risk is
    duplicate partition fills across the unrolled plan's subtrees).

All three share the identical unrolled iteration body (inlined copy of
components.pagerank's loop). Fingerprints checked equal before timing;
interleaved median-of-N per the round protocols.

MEASURED RESULT (r12, sf0.1, loadavg 1.8, fingerprints equal):
  A_committed: median 2.273s reps [2.62, 2.266, 2.273]
  B_concurrent: median 2.488s reps [2.187, 2.488, 2.544]
  C_lazy_n:     median 2.803s reps [2.803, 2.538, 2.896]
A wins — DEAD END, committed form kept. Why the q62/q107 pattern does
not transfer: there the second write is DRIVER-LITERAL data (zero
cluster compute), so overlapping it is free; here the overlapped count
job runs a real nodes-distinct exchange that contends with the o⋈l
edge materialize for the same local[32] cores, and C additionally
pays duplicate partition fills of the un-pinned node table across the
unrolled plan's subtrees. The pattern generalizes only when one side
is (near-)free of executor work.

Usage: python tools/decompose_q92.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import InheritableThread  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dropbox_duckdb_playground_spark.catalog import _PR_SCALE, load  # noqa: E402
from dropbox_duckdb_playground_spark.materialize import materialize  # noqa: E402
from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402

DAMPING = 85
ITERS = 3
BROADCAST_NODE_LIMIT = 8_000_000


def _edges_nodes(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    nodes = (
        load(spark, sf_dir, "customer")
        .select((F.col("c_custkey") * 2).alias("node"))
        .union(
            load(spark, sf_dir, "supplier").select(
                (F.col("s_suppkey") * 2 + 1).alias("node")
            )
        )
    )
    return edges, nodes


def _concurrent(*thunks):
    errs: list[BaseException] = []

    def run(t):
        try:
            t()
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [InheritableThread(target=run, args=(t,)) for t in thunks]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]


def _iterate(e, n, n_nodes):
    """Inlined copy of components.pagerank's unrolled loop (r11 HEAD)."""
    epart = e.repartition("dst")
    small = n_nodes <= BROADCAST_NODE_LIMIT
    init = _PR_SCALE // n_nodes
    base = (100 - DAMPING) * init // 100
    r = n.select("node", "outdeg", F.lit(init).cast("long").alias("r"))
    for it in range(ITERS):
        rsrc = r.filter(F.col("outdeg").isNotNull()).select(
            F.col("node").alias("src"), F.expr("r div outdeg").alias("c")
        )
        contrib = (
            epart.join(F.broadcast(rsrc) if small else rsrc, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("contrib"))
        )
        dang = r.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).alias("dang")
        )
        r = (
            n.join(F.broadcast(contrib) if small else contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "outdeg",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DAMPING} * (coalesce(contrib, 0)"
                        f" + (dang div {n_nodes}))) div 100"
                    )
                )
                .cast("long")
                .alias("r"),
            )
        )
        if it + 1 < ITERS:
            r = r.persist()
    pr = r.select("node", F.col("r").alias("rank"))
    return pr.filter(F.col("node") % 2 == 1).select(
        F.concat(
            F.lit("S"), ((F.col("node") - 1) / 2).cast("long").cast("string")
        ).alias("node"),
        "rank",
    )


def q92_a(spark, sf_dir):
    edges, nodes = _edges_nodes(spark, sf_dir)
    e = materialize(edges.select("src", "dst").distinct())
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    n = materialize(nodes.select("node").distinct().join(deg, "node", "left"))
    n_nodes = n.count()
    return _iterate(e, n, n_nodes)


def _prelude_b(spark, sf_dir):
    edges, nodes = _edges_nodes(spark, sf_dir)
    box: dict[str, object] = {}

    def mat_e():
        box["e"] = materialize(edges.select("src", "dst").distinct())

    def cnt():
        box["n_nodes"] = nodes.select("node").distinct().count()

    _concurrent(mat_e, cnt)
    e = box["e"]
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    n = nodes.select("node").distinct().join(deg, "node", "left")
    return e, n, box["n_nodes"]


def q92_b(spark, sf_dir):
    e, n, n_nodes = _prelude_b(spark, sf_dir)
    return _iterate(e, materialize(n), n_nodes)


def q92_c(spark, sf_dir):
    e, n, n_nodes = _prelude_b(spark, sf_dir)
    return _iterate(e, n.persist(), n_nodes)


FPRINT = lambda df: df.agg(  # noqa: E731
    F.count("*"), F.sum(F.xxhash64("node")), F.sum("rank")
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("q92probe")
    spark.sparkContext.setLogLevel("ERROR")

    forms = {"A_committed": q92_a, "B_concurrent": q92_b, "C_lazy_n": q92_c}
    fps = {}
    for name, fn in forms.items():
        fps[name] = tuple(FPRINT(fn(spark, sf_dir)).collect()[0])
        quiesce(spark)
    base = next(iter(fps.values()))
    for name, fp in fps.items():
        tag = "OK" if fp == base else "MISMATCH"
        print(f"fingerprint {name}: {fp} {tag}", flush=True)
    if any(fp != base for fp in fps.values()):
        print("ABORT: forms disagree")
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
