"""Pipeline composition + validators + incremental cache."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.engine import Engine
from dropbox_duckdb_playground_spark.plans.pipeline import (
    AssertNonEmpty,
    Pipeline,
    PipelineWiringError,
    PyNode,
    SQLNode,
    ValidateLinkIds,
    ValidationError,
    assert_frames_equal,
)
from dropbox_duckdb_playground_spark.streaming.incremental import IncrementalCache


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark=spark, root=str(tmp_path))


def test_sql_node_union_dedup(spark, engine):
    """The reference's SQLExecutor test shape (tests/test_executor.py:25-93):
    UNION of two identical 1-row tables -> one row."""
    engine.register("input5", spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"]))
    engine.register("input6", spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"]))
    node = SQLNode(
        sqls={"out": "SELECT * FROM input5 UNION SELECT * FROM input6"},
        input_ids=["input5", "input6"],
    )
    Pipeline([node]).execute(engine)
    assert engine.table("out").count() == 1


def test_sql_node_dialect(spark, engine):
    engine.register(
        "t_d", spark.createDataFrame([(1, "b"), (1, "a")], ["k", "v"])
    )
    node = SQLNode(sqls={"o_d": "SELECT DISTINCT ON (k) k, v FROM t_d"}, input_ids=["t_d"])
    node.run(engine)
    assert [(r.k, r.v) for r in engine.table("o_d").collect()] == [(1, "a")]


def test_py_node_schema_validation(spark, engine):
    engine.register("pin", spark.createDataFrame([(1,)], ["x"]))
    bad = PyNode(
        transform=lambda dfs: [dfs[0].withColumn("y", F.lit("s"))],
        input_ids=["pin"],
        output_ids=["pout"],
        output_schemas=[spark.createDataFrame([(1, 2)], ["x", "y"]).schema],
    )
    with pytest.raises(ValidationError, match="schema mismatch"):
        bad.run(engine)


def test_py_node_arity_validation(spark, engine):
    engine.register("pin2", spark.createDataFrame([(1,)], ["x"]))
    node = PyNode(
        transform=lambda dfs: dfs + dfs, input_ids=["pin2"], output_ids=["one"]
    )
    with pytest.raises(ValidationError, match="arity"):
        node.run(engine)


def test_wiring_consumer_before_producer():
    consumer = SQLNode(sqls={"b": "SELECT * FROM a"}, input_ids=["a"])
    with pytest.raises(PipelineWiringError, match="before any producer"):
        Pipeline([consumer]).validate_wiring()


def test_wiring_input_equals_output():
    with pytest.raises(PipelineWiringError, match="both input and output"):
        SQLNode(sqls={"a": "SELECT * FROM a"}, input_ids=["a"])


def test_validate_link_ids(spark, engine):
    engine.register("nodes", spark.createDataFrame([(1,), (2,)], ["node_id"]))
    engine.register(
        "links_ok", spark.createDataFrame([(1, 2)], ["from_id", "to_id"])
    )
    engine.register(
        "links_bad", spark.createDataFrame([(1, 99)], ["from_id", "to_id"])
    )
    ValidateLinkIds(link_id="links_ok", node_id="nodes").run(engine)
    with pytest.raises(ValidationError, match="missing"):
        ValidateLinkIds(link_id="links_bad", node_id="nodes").run(engine)


def test_assert_non_empty(spark, engine):
    engine.register("empty", spark.createDataFrame([], "x int"))
    with pytest.raises(ValidationError, match="empty"):
        AssertNonEmpty(obj_id="empty").run(engine)


def test_assert_frames_equal(spark):
    a = spark.createDataFrame([(1,), (2,)], ["x"])
    b = spark.createDataFrame([(2,), (1,)], ["x"])
    assert_frames_equal(a, b)  # order-insensitive
    with pytest.raises(ValidationError):
        assert_frames_equal(a, spark.createDataFrame([(1,), (1,)], ["x"]))


def test_materialize_roundtrip(spark, engine, tmp_path):
    engine.register("m_src", spark.createDataFrame([(1, "x")], ["k", "v"]))
    node = SQLNode(sqls={"m_out": "SELECT k, upper(v) AS v FROM m_src"}, input_ids=["m_src"])
    Pipeline([node], materialize=["m_out"]).execute(engine)
    again = spark.read.parquet(str(tmp_path / "m_out.parquet"))
    assert [(r.k, r.v) for r in again.collect()] == [(1, "X")]


def test_incremental_cache_cycle(spark, engine):
    cache = IncrementalCache(engine)
    engine.register("inc", spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]))
    # first run: everything is new
    assert cache.new_keys("inc", ["k"]).count() == 2
    cache.snapshot("inc")
    # second run with one extra row: only the new key survives the diff
    engine.register(
        "inc", spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    )
    got = cache.new_keys("inc", ["k"]).collect()
    assert [(r.k, r.v) for r in got] == [(3, "c")]
    # keep-first merge: updated beats cached
    merged = cache.merge_batches(
        [
            spark.createDataFrame([(1, "A")], ["k", "v"]),
            cache.load("inc"),
        ],
        keys=["k"],
    )
    assert dict((r.k, r.v) for r in merged.collect()) == {1: "A", 2: "b"}


def test_save_and_register_csv_json(spark, engine, tmp_path):
    engine.register(
        "fmt_src", spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    )
    csv_path = engine.save("fmt_src", fmt="csv")
    json_path = engine.save("fmt_src", fmt="json")
    assert csv_path.endswith(".csv") and json_path.endswith(".json")
    engine.register("fmt_csv", csv_path)
    engine.register("fmt_json", json_path)
    for oid in ("fmt_csv", "fmt_json"):
        got = sorted((int(r.k), r.v) for r in engine.table(oid).collect())
        assert got == [(1, "x"), (2, "y")]
    with pytest.raises(ValueError):
        engine.save("fmt_src", fmt="csv", bucket_by=["k"])
    with pytest.raises(ValueError):
        engine.save("fmt_src", fmt="orc")
