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


def test_cosine_neardup_pairs_finds_duplicate(spark):
    from dropbox_duckdb_playground_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    base = [float((i * 37) % 11 - 5) for i in range(8)]
    near = list(base)
    near[0] += 0.01
    far = [float(((i + 3) * 53) % 13 - 6) for i in range(8)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id int, embedding array<float>"
    )
    got = cosine_neardup_pairs(df, threshold=0.99, dim=8, planes=4).collect()
    assert [(r["a_id"], r["b_id"]) for r in got] == [(1, 2)]


def test_ivf_ann_recall_vs_brute_force(spark):
    from dropbox_duckdb_playground_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
    )

    # two well-separated clusters of vectors
    rows = []
    for i in range(40):
        c = i % 2
        vec = [
            float(10 * (1 - c) + ((i * 7 + d * 3) % 5) * 0.1)
            if d < 4
            else float(10 * c + ((i * 11 + d) % 5) * 0.1)
            for d in range(8)
        ]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.filter(F.col("vec_id") < 4)
    exact = cosine_topk(df, q, k=3, id_col="vec_id")
    approx = ivf_ann_topk(df, q, k=3, nlist=2, nprobe=1, id_col="vec_id", seed=7)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    # probing the single nearest of 2 clean clusters must recover most
    # exact neighbors
    assert len(a & e) / len(e) >= 0.8


def test_semantic_dedup_drops_only_within_cluster(spark):
    from dropbox_duckdb_playground_spark.operators.similarity import semantic_dedup

    # cluster A: three near-identical vectors (ids 1,2,3) -> keep min id
    # cluster B: one lone orthogonal-ish vector (id 9) -> survives
    a = [1.0, 0.0, 0.0, 0.0]
    a2 = [1.0, 0.02, 0.0, 0.0]
    a3 = [0.99, 0.0, 0.01, 0.0]
    b = [0.0, 0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        [(1, a), (2, a2), (3, a3), (9, b)], "vec_id int, embedding array<float>"
    )
    out = semantic_dedup(df, threshold=0.99, nlist=2, seed=7).collect()
    got = {r["vec_id"]: r["survived"] for r in out}
    assert got == {1: 1, 2: 0, 3: 0, 9: 1}
    # survivors keep their cluster assignment
    lists = {r["vec_id"]: r["list_id"] for r in out}
    assert lists[1] == lists[2] == lists[3]
    assert lists[9] != lists[1]


def test_semantic_dedup_min_id_is_the_representative(spark):
    from dropbox_duckdb_playground_spark.operators.similarity import semantic_dedup

    # all four near-identical -> exactly one survivor: the smallest id
    base = [3.0, 1.0, -2.0, 0.5]
    rows = [(i, [v + i * 1e-4 for v in base]) for i in (5, 11, 2, 8)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = semantic_dedup(df, threshold=0.999, nlist=1, seed=1).collect()
    survivors = sorted(r["vec_id"] for r in out if r["survived"] == 1)
    assert survivors == [2]


def test_pq_ann_recall_vs_brute_force(spark):
    from dropbox_duckdb_playground_spark.operators.similarity import (
        cosine_topk,
        pq_ann_topk,
    )

    # two well-separated clusters (same family as the IVF test): PQ's
    # asymmetric-distance top-k must recover most exact neighbors
    rows = []
    for i in range(40):
        c = i % 2
        vec = [
            float(10 * (1 - c) + ((i * 7 + d * 3) % 5) * 0.1)
            if d < 4
            else float(10 * c + ((i * 11 + d) % 5) * 0.1)
            for d in range(8)
        ]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.filter(F.col("vec_id") < 4)
    exact = cosine_topk(df, q, k=3, id_col="vec_id")
    approx = pq_ann_topk(df, q, k=3, m=4, ksub=8, dim=8, id_col="vec_id", seed=7)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.6  # ADC ranks by dot, exact by cosine


def test_pq_assign_codes_cover_all_subspaces(spark):
    from dropbox_duckdb_playground_spark.operators.similarity import pq_assign

    rows = [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    codes, book = pq_assign(df, m=4, ksub=4, dim=8, seed=3)
    got = codes.groupBy("cand_id").count().collect()
    assert all(r["count"] == 4 for r in got) and len(got) == 20
    assert book.count() == 16


def test_concurrent_writes_runs_all_and_propagates_errors(tmp_path):
    """r11: _concurrent_writes must execute every thunk (both staging
    files exist afterward) and re-raise a thunk's exception after all
    threads join — a failed staging write must not pass silently."""
    import pytest

    from dropbox_duckdb_playground_spark.operators.similarity import (
        _concurrent_writes,
    )

    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    _concurrent_writes(
        lambda: a.write_text("x"), lambda: b.write_text("y")
    )
    assert a.read_text() == "x" and b.read_text() == "y"

    done = []
    with pytest.raises(RuntimeError, match="boom"):
        _concurrent_writes(
            lambda: (_ for _ in ()).throw(RuntimeError("boom")),
            lambda: done.append(1),
        )
    assert done == [1]  # the healthy thunk still completed


def test_ivf_stage_dir_roundtrip(spark, tmp_path):
    """r11: after the concurrent-staging change, stage_dir mode must
    still write both parquet tables AND return frames that read them
    back with the exact pre-write schema (the oracle contract)."""
    from dropbox_duckdb_playground_spark.operators.similarity import ivf_assign

    rows = [(i, [float((i * 3 + d) % 7) for d in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    assigned, cent = ivf_assign(df, nlist=4, stage_dir=str(tmp_path / "ivf"))
    assert (tmp_path / "ivf" / "assigned").exists()
    assert (tmp_path / "ivf" / "centroids").exists()
    assert assigned.count() == 30
    assert [f.name for f in assigned.schema.fields] == [
        "cand_id", "c_vec", "list_id",
    ]
    assert cent.count() == 4


def test_concurrent_writes_notes_survive_without_add_note():
    """r12 ADVICE: on interpreters without PEP-678 add_note the extra
    concurrent failures must still be attached (appended to args), not
    silently dropped — the 'all failures propagate' contract holds on
    every interpreter."""
    import pytest

    from dropbox_duckdb_playground_spark.operators.similarity import (
        _concurrent_writes,
    )

    class NoNotesError(Exception):
        # accessing add_note raises AttributeError -> hasattr is False,
        # simulating a pre-3.11 interpreter on the first error object
        add_note = property()

    def fail_first():
        raise NoNotesError("first failure")

    def fail_second():
        raise RuntimeError("second failure")

    with pytest.raises(NoNotesError) as exc_info:
        _concurrent_writes(fail_first, fail_second)
    joined = " ".join(str(a) for a in exc_info.value.args)
    assert "first failure" in joined
    assert "additional concurrent-write failure" in joined
    assert "second failure" in joined
