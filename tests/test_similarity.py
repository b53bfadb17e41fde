"""Similarity search: brute-force correctness + LSH plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.operators.similarity import (
    cosine_topk,
    hyperplane_signature,
    hyperplane_weights,
    lsh_ann_topk,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(spark):
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.01]),   # nearly parallel to 0
            (2, [0.0, 1.0]),    # orthogonal
            (3, [-1.0, 0.0]),   # opposite
        ],
    )
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r.cand_id for r in sorted(out, key=lambda r: -r.cosine)]
    assert order == [1, 2, 3]
    top = [r for r in out if r.cand_id == 1][0]
    assert top.cosine > 0.999


def test_hyperplane_weights_deterministic():
    w1 = hyperplane_weights(8, 4)
    w2 = hyperplane_weights(8, 4)
    assert w1 == w2
    assert all(v in (1.0, -1.0) for row in w1 for v in row)


def test_lsh_ann_finds_identical_vector(spark):
    rows = [(i, [float((i * 7 + d) % 5) - 2.0 for d in range(8)]) for i in range(20)]
    rows.append((100, rows[0][1]))  # exact duplicate of vec 0
    df = _emb(spark, rows)
    out = lsh_ann_topk(df, df.filter(F.col("vec_id") == 100), dim=8, k=3)
    got = {r.cand_id: r.cosine for r in out.collect()}
    assert 0 in got and got[0] == 1.0
