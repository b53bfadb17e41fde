"""Pair-miner shape A/B (r13 follow-up): inverted-index self-JOIN vs
groupBy(sh) + in-row pair generation (collect_list + posexplode/slice),
for both ngram_jaccard_pairs paths:

* exact (q26 semantics): the committed self-join's two sides each run
  the full shingle+digest pass (r8 finding: join-pushed predicates
  specialize the sides, no shared exchange; a barrier measured a wash
  because the duplicate sides run concurrently).  The grouped form has
  ONE side — the shingle pass runs once by construction — and replaces
  the SMJ sorts with one ObjectHashAggregate.  Per-shingle fan-out is
  C(k,2) in both forms (a hot shingle lands in one task either way);
  the grouped form materializes k doc-ids per group instead of k
  sorted join rows.
* capped (q64 semantics, max_shingle_freq=3): the committed form pays
  a count-over-window per sh, a checkpoint of the capped table, and a
  shuffle_hash self-join.  The grouped form applies the cap as
  ``size(ds) <= cap`` on the collected array — no window sort, no
  self-join; the post-cap table (for sizes) is recovered by exploding
  the surviving arrays.

Both forms compute identical (a_id, b_id, jaccard) sets (asserted via
sorted-row hash every rep).  Interleaved in one session, median-of-N.

Usage:
    python tools/decompose_q26b.py [exact|capped|both] [sf_dir] [reps]
"""

from __future__ import annotations

import hashlib
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dropbox_duckdb_playground_spark.materialize import materialize  # noqa: E402
from dropbox_duckdb_playground_spark.operators import dedup as D  # noqa: E402
from dropbox_duckdb_playground_spark.operators.dedup import _hex60  # noqa: E402
from dropbox_duckdb_playground_spark.operators.text import ratio4_expr  # noqa: E402
from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402


def _load_docs(spark, sf_dir):
    from dropbox_duckdb_playground_spark.catalog import load

    return load(spark, sf_dir, "documents")


def _pairs_from_groups(per_sh, ds: str = "ds"):
    """(i-th, j-th) element pairs, i<j, from each group's sorted array."""
    e1 = per_sh.select(F.posexplode(ds).alias("i", "a"), F.col(ds))
    return e1.select(
        "a",
        F.explode(F.slice(ds, F.col("i") + F.lit(2), F.size(ds))).alias("b"),
    )


def cur_exact(spark, sf_dir):
    sh = D.shingles(_load_docs(spark, sf_dir), n=3, with_size=True)
    return D.ngram_jaccard_pairs(sh, threshold=0.2, exact=True)


def grouped_exact(spark, sf_dir):
    # collect_list below is safe from duplicate doc_ids per group ONLY
    # because D.shingles guarantees DISTINCT (doc_id, shingle) rows by
    # contract (dedup.shingles docstring: "Distinct word n-gram
    # shingles per document") — a duplicate emission would create
    # self-pairs and inflated common counts in _pairs_from_groups
    # (r13 ADVICE; the per-rep hash assertion would crash on it).
    sh = D.shingles(_load_docs(spark, sf_dir), n=3, with_size=True)
    hashed = sh.select(
        F.col("doc_id"), _hex60(F.col("shingle")).alias("sh"), F.col("sz")
    )
    per_sh = hashed.groupBy("sh").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "sz"))).alias("ds")
    )
    common = _pairs_from_groups(per_sh).groupBy(
        F.col("a.doc_id").alias("a_id"),
        F.col("b.doc_id").alias("b_id"),
        F.col("a.sz").alias("sz_a"),
        F.col("b.sz").alias("sz_b"),
    ).agg(F.count("*").alias("common"))
    return (
        common.withColumn("jaccard", ratio4_expr("common", "sz_a + sz_b - common"))
        .filter(F.col("jaccard") >= 0.2)
        .select("a_id", "b_id", "jaccard")
    )


def cur_capped(spark, sf_dir):
    sh = D.shingles(_load_docs(spark, sf_dir), n=3)
    return D.ngram_jaccard_pairs(sh, threshold=0.2, max_shingle_freq=3)


def grouped_capped(spark, sf_dir):
    cap = 3
    sh = D.shingles(_load_docs(spark, sf_dir), n=3)
    hashed = sh.select(F.col("doc_id"), _hex60(F.col("shingle")).alias("sh"))
    per_sh = materialize(
        hashed.groupBy("sh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") <= cap)
    )
    sizes = (
        per_sh.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
    )
    common = (
        _pairs_from_groups(per_sh)
        .groupBy(F.col("a").alias("a_id"), F.col("b").alias("b_id"))
        .agg(F.count("*").alias("common"))
        .join(sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sz_a")), "a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("sz_b")), "b_id")
    )
    return (
        common.withColumn("jaccard", ratio4_expr("common", "sz_a + sz_b - common"))
        .filter(F.col("jaccard") >= 0.2)
        .select("a_id", "b_id", "jaccard")
    )


def _result_hash(df) -> tuple[str, int]:
    rows = sorted(tuple(r) for r in df.collect())
    h = hashlib.md5(repr(rows).encode()).hexdigest()[:12]
    return h, len(rows)


def run_family(spark, family: str, sf_dir: str, reps: int) -> None:
    forms = (
        {"cur": cur_exact, "grouped": grouped_exact}
        if family == "exact"
        else {"cur": cur_capped, "grouped": grouped_capped}
    )
    for fn in forms.values():
        _result_hash(fn(spark, "/root/testdata/sf0.001"))
        quiesce(spark)
    acc: dict[str, list[float]] = {k: [] for k in forms}
    hashes: set[tuple[str, int]] = set()
    for i in range(reps):
        for label, fn in forms.items():
            t0 = time.time()
            h = _result_hash(fn(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            acc[label].append(dt)
            hashes.add(h)
            print(f"[{family}] rep{i} {label}: {dt}s rows={h[1]} hash={h[0]}", flush=True)
            quiesce(spark)
    assert len(hashes) == 1, f"result mismatch: {hashes}"
    meds = {k: statistics.median(v) for k, v in acc.items()}
    base = meds["cur"]
    for k, v in meds.items():
        print(
            f"[{family}] MEDIAN {k}: {v:.3f}s ({(base - v) / base * 100:+.1f}% vs cur)",
            flush=True,
        )


def main() -> None:
    family = sys.argv[1] if len(sys.argv) > 1 else "both"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("decompose_q26b")
    fams = ("exact", "capped") if family == "both" else (family,)
    for fam in fams:
        run_family(spark, fam, sf_dir, reps)


if __name__ == "__main__":
    main()
