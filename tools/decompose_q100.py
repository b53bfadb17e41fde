"""q100_curation_policy decomposition (r11).

After the r11 tpch fixes, q100 is the worst undecomposed row by data
time in RATIO.md (6.25s spark / 5.98s data / 3.8x in the r10 driver
run). The committed form (already improved once, r10: owner-trick
boilerplate) still tokenizes `documents` THREE times — quality_score's
feature pass, shingles()'s explode pass (corpus-wide freq state, which
is irreducible), and a third split+NGram pass for the per-doc distinct
3-gram count — and assembles the verdict with three doc-keyed joins
(quality x boiler x lang).

Form B fuses quality features, the distinct-3-gram count, and lang
into ONE projection over ONE tokenize (the shingle-freq pass stays, as
it must), and replaces the three-way join with a single LEFT JOIN
against the corpus-unique-owner counts. Exact same integer-arithmetic
feature expressions as operators/text.quality_score — the 4dp values
must stay bit-identical to the oracle.

Usage: python tools/decompose_q100.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dropbox_duckdb_playground_spark import catalog as C  # noqa: E402
from dropbox_duckdb_playground_spark.catalog import load  # noqa: E402
from dropbox_duckdb_playground_spark.operators import dedup as D  # noqa: E402
from dropbox_duckdb_playground_spark.operators.relational import fan_out  # noqa: E402
from dropbox_duckdb_playground_spark.operators.text import (  # noqa: E402
    DEFAULT_STOPWORDS,
    ratio4_expr,
    tokens_col,
)
from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402


def q100_a(spark, sf_dir):
    """Pre-r11 committed form (inline copy — the catalog adopted B):
    quality_score pass + shingle-freq pass + a third split/NGram pass,
    assembled with three doc-keyed joins."""
    from pyspark.ml.feature import NGram

    from dropbox_duckdb_playground_spark.operators import text as TX

    d = load(spark, sf_dir, "documents")
    q = TX.quality_score(d)
    sh = D.shingles(d, n=3)
    g = sh.groupBy("shingle").agg(
        F.count("*").alias("__f__"), F.min("doc_id").alias("__owner__")
    )
    uniq = (
        g.filter(F.col("__f__") == 1)
        .groupBy("__owner__")
        .agg(F.count("*").alias("__u__"))
    )
    src = fan_out(d.select("doc_id", "text")).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("__toks__")
    )
    src = NGram(n=3, inputCol="__toks__", outputCol="__ng__").transform(src)
    nsh = src.select(
        "doc_id",
        F.size(F.array_distinct("__ng__")).cast("long").alias("__n__"),
    ).filter(F.col("__n__") > 0)
    boiler = (
        nsh.join(uniq, F.col("doc_id") == F.col("__owner__"), "left")
        .select(
            F.col("doc_id"),
            (F.col("__n__") - F.coalesce(F.col("__u__"), F.lit(0)))
            .cast("long")
            .alias("__b__"),
            F.col("__n__"),
        )
        .select("doc_id", ratio4_expr("__b__", "__n__").alias("boiler_ratio"))
    )
    feats = (
        q.join(boiler, "doc_id", "left")
        .join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "quality",
            F.coalesce(F.col("boiler_ratio"), F.lit(0)).alias("boiler_ratio"),
        )
    )
    keep = (
        F.col("n_tokens").between(25, 75)
        & (F.col("quality") >= 0.5)
        & (F.col("boiler_ratio") <= 0.95)
    )
    return feats.select(
        "doc_id",
        "lang",
        "n_tokens",
        "quality",
        "boiler_ratio",
        keep.cast("int").alias("keep"),
        F.concat_ws(
            ",",
            F.when(F.col("n_tokens") < 25, "too_short"),
            F.when(F.col("n_tokens") > 75, "too_long"),
            F.when(F.col("quality") < 0.5, "low_quality"),
            F.when(F.col("boiler_ratio") > 0.95, "boilerplate"),
        ).alias("reject_reasons"),
    )


def q100_b(spark, sf_dir):
    from pyspark.ml.feature import NGram

    d = load(spark, sf_dir, "documents")

    # corpus-wide state: distinct-shingle frequency -> per-owner count
    # of corpus-unique shingles (identical to the committed subplan)
    sh = D.shingles(d, n=3)
    g = sh.groupBy("shingle").agg(
        F.count("*").alias("__f__"), F.min("doc_id").alias("__owner__")
    )
    uniq = (
        g.filter(F.col("__f__") == 1)
        .groupBy("__owner__")
        .agg(F.count("*").alias("__u__"))
    )

    # ONE tokenize pass: quality features + distinct-3-gram count + lang
    trimmed = F.trim(F.col("text"))
    toks = tokens_col("text")
    stop_pat = "(?<=^|\\s)(?:" + "|".join(
        "\\Q" + s + "\\E" for s in DEFAULT_STOPWORDS
    ) + ")(?=\\s|$)"
    src = fan_out(d.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("__ntr__"),
        F.greatest(F.size(toks), F.lit(1)).cast("long").alias("__nt__"),
        F.regexp_count(trimmed, F.lit(stop_pat)).cast("long").alias("__stop__"),
        F.size(F.array_distinct(toks)).cast("long").alias("__dist__"),
        F.length(F.regexp_replace(trimmed, r"\s+", "")).cast("long").alias("__chars__"),
        F.split(trimmed, r"\s+").alias("__toks__"),
    )
    src = NGram(n=3, inputCol="__toks__", outputCol="__ng__").transform(src)
    blend_num = (
        "least(__ntr__, 100L) * __nt__"
        " + 100L * least(5L * __stop__, __nt__)"
        " + 100L * __dist__"
        " + if(__chars__ >= 3L * __nt__ and __chars__ <= 10L * __nt__,"
        "      100L * __nt__, 0L)"
    )
    r4 = "(((20000L * ({p})) + ({q})) div (2L * ({q}))) / cast(10000 as double)"
    feats = src.select(
        "doc_id",
        "lang",
        F.col("__ntr__").alias("n_tokens"),
        F.expr(r4.format(p=blend_num, q="400L * __nt__")).alias("quality"),
        F.size(F.array_distinct("__ng__")).cast("long").alias("__n__"),
    )
    assembled = feats.join(
        uniq, feats["doc_id"] == uniq["__owner__"], "left"
    ).select(
        "doc_id",
        "lang",
        "n_tokens",
        "quality",
        F.when(
            F.col("__n__") > 0,
            ratio4_expr(
                "(__n__ - coalesce(__u__, 0L))", "__n__"
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("boiler_ratio"),
    )
    keep = (
        F.col("n_tokens").between(25, 75)
        & (F.col("quality") >= 0.5)
        & (F.col("boiler_ratio") <= 0.95)
    )
    return assembled.select(
        "doc_id",
        "lang",
        "n_tokens",
        "quality",
        "boiler_ratio",
        keep.cast("int").alias("keep"),
        F.concat_ws(
            ",",
            F.when(F.col("n_tokens") < 25, "too_short"),
            F.when(F.col("n_tokens") > 75, "too_long"),
            F.when(F.col("quality") < 0.5, "low_quality"),
            F.when(F.col("boiler_ratio") > 0.95, "boilerplate"),
        ).alias("reject_reasons"),
    )


def fprint(df):
    return df.agg(
        F.count("*"),
        F.sum("n_tokens"),
        F.sum((F.col("quality") * 10000).cast("long")),
        F.sum((F.col("boiler_ratio") * 10000).cast("long")),
        F.sum("keep"),
        F.sum(F.length("reject_reasons")),
        F.sum(F.length("lang")),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("q100probe")
    spark.sparkContext.setLogLevel("ERROR")
    forms = {"A_committed": q100_a, "B_onepass": q100_b}
    fps = {}
    for name, fn in forms.items():
        fps[name] = tuple(fprint(fn(spark, sf_dir)).collect()[0])
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
