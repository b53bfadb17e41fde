"""q50_repetition bigram-extraction A/B/C (guide §1.2 step 2, §4.1).

repetition_stats extracts per-doc bigrams with a LOOKAHEAD regex
(``(?<![^ ])(?=(\\S+ \\S+))`` via regexp_extract_all) — the same
formulation dedup.shingles measured ~1.5x SLOWER than the Spark ML
NGram array walk, because Java regex pays backtracking at every
character position. Candidates produce the identical bigram multiset
from the already-split token array:

  regex  — committed form
  zipwith — zip_with(slice(t,1,n-1), slice(t,2,n-1), concat) —
            pure Column expression, interpreted HOF lambda
  ngram  — pyspark.ml.feature.NGram(n=2) transform, compiled JVM
            array walk (the shingles-winning form)

All three feed the same downstream aggregate; per-round output digests
are asserted equal.

Usage: python tools/decompose_q50.py [sf_dir] [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

KEY = "doc_id"


def _norm():
    return F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")


def _uni(df: DataFrame) -> DataFrame:
    return (
        df.select(F.col(KEY), F.explode(F.split(_norm(), " ")).alias("g"))
        .groupBy(KEY, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(KEY)
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("top_uni"))
    )


def _tail(uni: DataFrame, bi_exploded: DataFrame) -> DataFrame:
    bi = (
        bi_exploded.groupBy(KEY, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(KEY)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bi"),
            F.sum(F.when(F.col("c") > 1, F.col("c"))).alias("dup_bi"),
        )
    )
    return uni.join(bi, on=KEY, how="left").select(
        F.col(KEY),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("top_uni") / F.col("n_tokens"), 4).alias("top_unigram_frac"),
        F.round(
            F.coalesce(F.col("top_bi") / F.col("n_bigrams"), F.lit(0.0)), 4
        ).alias("top_bigram_frac"),
        F.round(
            F.coalesce(F.col("dup_bi") / F.col("n_bigrams"), F.lit(0.0)), 4
        ).alias("dup_bigram_frac"),
    )


def form_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dropbox_duckdb_playground_spark.catalog import load

    df = load(spark, sf_dir, "documents")
    pat = r"(?<![^ ])(?=(\S+ \S+))"
    bi = df.select(
        F.col(KEY),
        F.explode(F.regexp_extract_all(_norm(), F.lit(pat), 1)).alias("g"),
    )
    return _tail(_uni(df), bi)


def form_zipwith(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dropbox_duckdb_playground_spark.catalog import load

    df = load(spark, sf_dir, "documents")
    t = F.split(_norm(), " ")
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(t, 1, n1),
        F.slice(t, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bi = df.select(F.col(KEY), F.explode(bigrams).alias("g"))
    return _tail(_uni(df), bi)


def form_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import NGram

    from dropbox_duckdb_playground_spark.catalog import load

    df = load(spark, sf_dir, "documents")
    src = df.select(F.col(KEY), F.split(_norm(), " ").alias("__toks__"))
    src = NGram(n=2, inputCol="__toks__", outputCol="__bi__").transform(src)
    bi = src.select(F.col(KEY), F.explode("__bi__").alias("g"))
    return _tail(_uni(df), bi)


FORMS = {"regex": form_regex, "zipwith": form_zipwith, "ngram": form_ngram}


def digest(df: DataFrame) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.md5(str(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("q50_ab")
    digs = {}
    for label, fn in FORMS.items():
        digs[label] = digest(fn(spark, "/root/testdata/sf0.001"))
        quiesce(spark)
    assert len(set(digs.values())) == 1, digs
    print(f"sf0.001 digests equal: {digs['regex']}", flush=True)
    acc = {k: [] for k in FORMS}
    for i in range(rounds):
        for label, fn in FORMS.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            acc[label].append(round(time.time() - t0, 3))
            quiesce(spark)
        print(f"round {i}: " + " ".join(f"{k}={acc[k][-1]}" for k in acc), flush=True)
    for k, v in acc.items():
        print(f"{k}: median={sorted(v)[len(v)//2]} all={v}", flush=True)
    d = {k: digest(fn(spark, sf_dir)) for k, fn in FORMS.items()}
    assert len(set(d.values())) == 1, d
    print(f"{sf_dir} digests equal: {d['regex']}", flush=True)


if __name__ == "__main__":
    main()
