"""q62_ivf_ann / q107_pq_ann staged-model launch-floor probe (r11).

These two carry the largest sf1 ratios in the book (25.8x / 20.8x at
2.09/2.23s absolute — r10 SF1_BENCH) for a documented reason: the
oracle replays only the relational tail over the staged parquet, while
Spark pays the whole staged-model handshake every run. The r10 verdict
asked for one probe: can the fixed job count be reduced without
touching the oracle contract (the staged files and their schemas must
stay exactly as the oracle SQL expects)?

Stage attribution first (one timed sub-step per fixed job of the
committed q62 form), then A/B forms:

  A committed ivf_ann_topk / pq_ann_topk (sequential staging writes,
    schema-inferred read-back)
  B same semantics with (i) the two staging writes submitted
    CONCURRENTLY from two Python threads (Spark schedules independent
    jobs in parallel; the centroid/codebook write is driver-literal
    data so it does not contend with the assignment scan), and
    (ii) the read-back given its schema explicitly, skipping the
    footer-inference job.

Fingerprints checked equal before timing (same protocol as every
decompose tool in this repo).

Usage: python tools/decompose_q62q107.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dropbox_duckdb_playground_spark import catalog as C  # noqa: E402
from dropbox_duckdb_playground_spark.catalog import load  # noqa: E402
from dropbox_duckdb_playground_spark.operators import similarity as S  # noqa: E402
from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402


def q62_a(spark, sf_dir):
    return C.q62_ivf_ann(spark, sf_dir)


def q107_a(spark, sf_dir):
    return C.q107_pq_ann(spark, sf_dir)


def _concurrent_writes(*thunks):
    """Submit independent Spark jobs from threads; join all."""
    errs: list[BaseException] = []

    def run(t):
        try:
            t()
        except BaseException as e:  # propagate after join
            errs.append(e)

    threads = [threading.Thread(target=run, args=(t,)) for t in thunks]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]


def q62_b(spark, sf_dir):
    """ivf_ann_topk with concurrent staging writes + explicit read-back
    schema. Copy of operators/similarity.ivf_ann_topk with only the
    staging block changed — candidate form for adoption if it wins."""
    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    nlist, nprobe, k, seed = 8, 2, 5, 42
    stage_dir = C._IVF_STAGE

    vecs = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_vec"))
    raw = e.select(F.col("embedding").alias("c_vec"))
    train_cap = max(nlist * 256, 2048)
    sample = raw.limit(train_cap)
    X = np.asarray(sample.toPandas()["c_vec"].tolist(), dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    Cm = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)]
    for _ in range(10):
        assign = (X @ Cm.T).argmax(axis=1)
        for j in range(len(Cm)):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                Cm[j] = m / max(np.linalg.norm(m), 1e-12)
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(vecs.schema.fields) + [StructField("list_id", IntegerType())]
    )
    Ct = Cm.T.copy()

    def assign_lists(batches):
        for pdf in batches:
            M = np.asarray(pdf["c_vec"].tolist(), dtype=np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            yield pdf.assign(list_id=(M @ Ct).argmax(axis=1).astype("int32"))

    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(Cm)],
        "list_id int, centroid array<double>",
    )
    a_path = os.path.join(stage_dir, "assigned")
    _concurrent_writes(
        lambda: vecs.mapInPandas(assign_lists, schema=out_schema)
        .write.mode("overwrite")
        .parquet(a_path),
        lambda: cent_df.write.mode("overwrite").parquet(
            os.path.join(stage_dir, "centroids")
        ),
    )
    assigned = spark.read.schema(out_schema).parquet(a_path)

    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    probed = (
        q.join(F.broadcast(cent_df))
        .withColumn("cdist", S.cosine(F.col("q_vec"), F.col("centroid")))
        .withColumn(
            "__rn__",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cdist"), F.asc("list_id"))
            ),
        )
        .filter(F.col("__rn__") <= nprobe)
        .select("query_id", "q_vec", "list_id")
    )
    scored = (
        assigned.join(F.broadcast(probed), "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(S.cosine(F.col("q_vec"), F.col("c_vec")), 4))
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def stage_attribution(spark, sf_dir):
    import numpy as np

    print(f"\n== q62 stage attribution at {sf_dir} ==", flush=True)
    e = load(spark, sf_dir, "embeddings")
    t0 = time.time()
    raw = e.select(F.col("embedding").alias("c_vec")).limit(2048)
    X = np.asarray(raw.toPandas()["c_vec"].tolist(), dtype=np.float64)
    print(f"  sample collect ({len(X)} rows): {time.time() - t0:.3f}s", flush=True)
    t0 = time.time()
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(42)
    Cm = X[rng.choice(len(X), size=8, replace=False)]
    for _ in range(10):
        assign = (X @ Cm.T).argmax(axis=1)
        for j in range(len(Cm)):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                Cm[j] = m / max(np.linalg.norm(m), 1e-12)
    print(f"  driver k-means fit: {time.time() - t0:.3f}s", flush=True)
    assigned, cent = S.ivf_assign(e, nlist=8, stage_dir=C._IVF_STAGE)
    t0 = time.time()
    assigned, cent = S.ivf_assign(e, nlist=8, stage_dir=C._IVF_STAGE)
    print(f"  ivf_assign total (fit + 2 staging writes): {time.time() - t0:.3f}s", flush=True)
    t0 = time.time()
    q62_a(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"  q62 full: {time.time() - t0:.3f}s", flush=True)
    quiesce(spark)


FPRINT = lambda df: df.agg(  # noqa: E731
    F.count("*"),
    F.sum("query_id"),
    F.sum("cand_id"),
    F.sum((F.col("cosine") * 10000).cast("long")),
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("q62probe")
    spark.sparkContext.setLogLevel("ERROR")
    stage_attribution(spark, sf_dir)

    forms = {"A_committed": q62_a, "B_concurrent": q62_b}
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
    # q107: time committed only (attribution; the same staging change
    # applies if q62's B wins)
    t107 = []
    for _ in range(reps):
        t0 = time.time()
        q107_a(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t107.append(time.time() - t0)
        quiesce(spark)
    print(f"q107 committed: median {statistics.median(t107):.3f}s "
          f"reps {[round(x, 3) for x in t107]}", flush=True)
    print(f"loadavg {os.getloadavg()[0]:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
