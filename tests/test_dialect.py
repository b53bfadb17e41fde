"""Dialect shim unit tests (reference semantics: SURVEY §8.1-8.2)."""

from __future__ import annotations

from dropbox_duckdb_playground_spark.sql.dialect import translate


def test_hash_rewrite():
    assert translate("SELECT HASH(a) FROM t") == "SELECT xxhash64(a) FROM t"
    assert translate("SELECT hash(CONCAT(a, '|', b)) FROM t") == (
        "SELECT xxhash64(CONCAT(a, '|', b)) FROM t"
    )


def test_exclude_rewrite():
    assert translate("SELECT t.* EXCLUDE (x) FROM t") == "SELECT t.* EXCEPT (x) FROM t"


def test_distinct_on_basic():
    out = translate("SELECT DISTINCT ON (k) k, v FROM t")
    assert "row_number() OVER (PARTITION BY k ORDER BY k, v)" in out
    assert out.startswith("SELECT k, v FROM (")
    assert "__rn__ = 1" in out


def test_distinct_on_alias_keys_resolved():
    out = translate("SELECT DISTINCT ON (nid) xxhash64(a) AS nid, b FROM t")
    # alias in the key list must be replaced by its expression
    assert "PARTITION BY xxhash64(a)" in out


def test_distinct_on_with_order_by():
    out = translate(
        "SELECT DISTINCT ON (k) k, v FROM t ORDER BY v DESC"
    )
    assert "ORDER BY v DESC) AS __rn__" in out
    assert out.rstrip().endswith("ORDER BY v DESC")


def test_distinct_on_executes(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (2, "c")], ["k", "v"]
    )
    df.createOrReplaceTempView("t_dialect")
    rows = spark.sql(
        translate("SELECT DISTINCT ON (k) k, v FROM t_dialect")
    ).collect()
    got = {(r.k, r.v) for r in rows}
    assert got == {(1, "a"), (2, "c")}  # deterministic: first under (k, v)


def test_distinct_on_qualified_refs_and_unaliased_exprs(spark):
    """Qualified refs (t.col) and unaliased expressions in the DISTINCT ON
    select list must survive the rewrite: the outer select projects
    output names, not raw item text (ADVICE r1)."""
    from dropbox_duckdb_playground_spark.sql.dialect import translate

    spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "c", 5)], ["k", "v", "n"]
    ).createOrReplaceTempView("t_don")
    out = spark.sql(
        translate(
            "SELECT DISTINCT ON (t.k) t.k, t.v, n + 0 FROM t_don t ORDER BY t.k, n DESC"
        )
    )
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, "b", 20), (2, "c", 5)]
    assert out.columns[:2] == ["k", "v"]
