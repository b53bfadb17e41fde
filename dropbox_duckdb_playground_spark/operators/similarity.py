"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the LSH
(random-hyperplane) bucketed variant is the scale path: at 100 TB the
cross join is infeasible, but hyperplane-bucketed candidates cut the
candidate space by ~2^planes while the final exact re-rank keeps
precision. All arithmetic stays in Column expressions (codegen) —
no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.materialize import materialize

from dropbox_duckdb_playground_spark.operators.dedup import _hex60


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (brute force).

    Output: (query_id, cand_id, cosine) with deterministic ordering
    (rounded score desc, cand_id asc). Scale: broadcast the query set;
    the scan over candidates is embarrassingly parallel; per-query top-k
    is a single shuffle on query_id (rank-1..k window)."""
    from dropbox_duckdb_playground_spark.operators.relational import fan_out

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(embeddings).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4))
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def hyperplane_weights(dim: int, planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane weights: plane p, dim d gets the parity
    bit of md5(f"{p}:{d}") — no stored model, reproducible in any engine."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) & 1 else -1.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def hyperplane_signature(vec: Column, dim: int, planes: int = 8) -> Column:
    """Random-hyperplane LSH signature (int, ``planes`` bits).
    Bit p = 1 iff Σ_d w[p,d]·vec[d] > 0, with deterministic md5-parity
    weights (`hyperplane_weights`). Pure column arithmetic — codegen'd."""
    weights = hyperplane_weights(dim, planes)
    sig = F.lit(0).cast("long")
    for p in range(planes):
        warr = F.array(*[F.lit(w) for w in weights[p]])
        proj = F.aggregate(
            F.zip_with(vec, warr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(0)
    return sig


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket;
    exact cosine re-rank within the bucket. ~2^planes candidate reduction.

    Output schema matches `cosine_topk` (query_id, cand_id, cosine)."""
    from dropbox_duckdb_playground_spark.operators.relational import fan_out

    sig = hyperplane_signature(F.col(vec_col), dim, planes)
    embeddings = fan_out(embeddings)
    c = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"), sig.alias("bucket")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), sig.alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4))
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family): distinct
    (a_id, b_id, cosine) with a_id < b_id and cosine ≥ threshold,
    candidates restricted to same LSH hyperplane bucket.

    Near-identical vectors agree on every hyperplane with probability
    ~(1 - θ/π)^planes, so a high threshold keeps recall high while the
    bucket equi-join replaces the O(n²) cross join — the same
    bucket-join shape as MinHash-LSH text dedup (SURVEY-beyond: LLM
    training-data dedup). Deterministic hyperplanes (md5 parity), so an
    external oracle can replicate the exact candidate set."""
    from dropbox_duckdb_playground_spark.operators.relational import fan_out

    sig = hyperplane_signature(F.col(vec_col), dim, planes)
    c = materialize(
        fan_out(embeddings)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), sig.alias("bucket"))
    )
    l, r = c.alias("l"), c.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a_id"),
            F.col("r.id").alias("b_id"),
            F.round(cosine(F.col("l.vec"), F.col("r.vec")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer -> per-centroid
    posting lists -> probe the ``nprobe`` nearest lists per query ->
    exact cosine re-rank inside the probed lists.

    The scale path when LSH recall is insufficient: centroids are
    trained once (spark.ml KMeans, seeded), assignment is one narrow
    pass, and each query touches ~nprobe/nlist of the corpus. Output
    schema matches `cosine_topk` (query_id, cand_id, cosine). Not
    SQL-oracle-able (k-means); correctness is asserted against
    brute-force recall in tests."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from dropbox_duckdb_playground_spark.operators.relational import fan_out

    vecs = fan_out(embeddings).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("features", array_to_vector(F.col("c_vec").cast("array<double>")))
    km = KMeans(k=nlist, seed=seed, maxIter=10).fit(vecs.select("features"))
    assigned = materialize(
        km.transform(vecs).select(
            "cand_id", "c_vec", F.col("prediction").alias("list_id")
        )
    )

    centroids = [[float(x) for x in c] for c in km.clusterCenters()]
    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "list_id int, centroid array<double>"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # nearest nprobe centroids per query (centroid table is tiny: nlist rows)
    probed = (
        q.join(F.broadcast(cent_df))
        .withColumn("cdist", cosine(F.col("q_vec"), F.col("centroid")))
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
        .withColumn("cosine", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4))
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )
