"""Shingle-frequency-cap shape A/B (r13): count-over-window vs
aggregate + anti-join, for ngram_jaccard_pairs' internal capped path
(q64 explicitly; q34/q43/q47 via the default cap).

The committed cap pays `count(*) over (partition by sh)` — a FULL
exchange + sort of the posting table — before the checkpoint, and the
committed q64 plan (plans/r13/q64_jaccard_capped_before.txt) shows the
checkpoint does NOT carry that partitioning into the self-join: both
SHJ sides re-exchange the capped table regardless.  So the window's
posting-table exchange+sort is pure build-stage cost.  The candidate
form computes per-shingle counts with a partial-aggregated
groupBy("sh") (ONE aggregated row per shingle crosses the wire, guide
§2.3), keeps only the HOT shingles (df > cap — the stop-shingle set,
tiny at bench scale), and LEFT ANTI joins them back with NO hint: AQE
broadcasts the hot set here (posting table never shuffles before the
checkpoint, guide §2.4) and falls back to a shuffle anti-join at a
scale where the hot set is vocabulary-sized — no forced broadcast, so
no q116-style OOM cliff.

Row-multiset equivalence: window-filter keeps rows whose shingle's
row count <= cap; the anti join drops rows whose shingle sits in
{sh : count > cap}.  Same predicate per row, duplicates and all.
Downstream (checkpoint, sizes aggregate, shuffle_hash self-join,
ratio4 threshold) is byte-identical between forms.

Both forms' (a_id, b_id, jaccard) sets are asserted identical via
sorted-row hash every rep.  Interleaved in one session, median-of-N.

Usage:
    python tools/decompose_cap.py [sf_dir] [reps] [cap]
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


def cur_capped(spark, sf_dir, cap):
    sh = D.shingles(_load_docs(spark, sf_dir), n=3)
    return D.ngram_jaccard_pairs(sh, threshold=0.2, max_shingle_freq=cap)


def anti_capped(spark, sf_dir, cap):
    """ngram_jaccard_pairs' internal capped path with the window
    replaced by agg + unhinted left-anti; everything else verbatim."""
    sh = D.shingles(_load_docs(spark, sf_dir), n=3)
    hashed = sh.select(F.col("doc_id"), _hex60(F.col("shingle")).alias("sh"))
    hot = (
        hashed.groupBy("sh")
        .agg(F.count("*").alias("__df__"))
        .filter(F.col("__df__") > cap)
        .select("sh")
    )
    capped = materialize(hashed.join(hot, "sh", "left_anti"))
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("sz"))
    l, r = capped.alias("l"), capped.hint("shuffle_hash").alias("r")
    joined = l.join(
        r, (F.col("l.sh") == F.col("r.sh")) & (F.col("l.doc_id") < F.col("r.doc_id"))
    )
    common = (
        joined.groupBy(
            F.col("l.doc_id").alias("a_id"), F.col("r.doc_id").alias("b_id")
        )
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("decompose_cap")
    forms = {"cur": cur_capped, "anti": anti_capped}
    for fn in forms.values():
        _result_hash(fn(spark, "/root/testdata/sf0.001", cap))
        quiesce(spark)
    acc: dict[str, list[float]] = {k: [] for k in forms}
    hashes: set[tuple[str, int]] = set()
    for i in range(reps):
        for label, fn in forms.items():
            spark.sparkContext.setJobDescription(f"cap:{label}:rep{i}")
            t0 = time.time()
            h = _result_hash(fn(spark, sf_dir, cap))
            dt = round(time.time() - t0, 3)
            acc[label].append(dt)
            hashes.add(h)
            print(f"rep{i} {label}: {dt}s rows={h[1]} hash={h[0]}", flush=True)
            quiesce(spark)
    assert len(hashes) == 1, f"result mismatch: {hashes}"
    meds = {k: statistics.median(v) for k, v in acc.items()}
    base = meds["cur"]
    for k, v in meds.items():
        print(f"MEDIAN {k}: {v:.3f}s ({(base - v) / base * 100:+.1f}% vs cur)", flush=True)


if __name__ == "__main__":
    main()
