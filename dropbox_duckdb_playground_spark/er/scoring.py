"""ER pairwise scoring (E6): pluggable scorers over candidate pairs.

The reference scores 100-row batches with a pickled dedupe model on 8
processes (mapper/messy.py:285-413). Two Spark paths:

1. `expression_scorer` (default): string-similarity features + fixed
   logistic weights, entirely in Column expressions — JVM-side, codegen,
   no Python. This is the self-contained scorer SURVEY §8.5(b) calls for.
2. `pandas_batch_scorer`: an `mapInPandas` wrapper that broadcasts an
   arbitrary pickled model and scores Arrow batches — the fidelity path
   for dedupe-model artifacts (§8.5(a)). Model is deserialized once per
   executor (lazy global), batches sized by
   `spark.sql.execution.arrow.maxRecordsPerBatch`.

After scoring: threshold filter + per-left-id argmax (A4) mirror
mapper/messy.py:338-345 / mapper/canon.py:194-201.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_levenshtein_sim(a: Column, b: Column) -> Column:
    """1 - levenshtein/maxlen, null-safe (null/'' => 0 similarity)."""
    sim = 1.0 - F.levenshtein(a, b) / F.greatest(
        F.greatest(F.length(a), F.length(b)), F.lit(1)
    )
    return F.when(a.isNull() | b.isNull(), 0.0).otherwise(sim)


def token_jaccard_sim(a: Column, b: Column) -> Column:
    ta, tb = F.split(a, r"\s+"), F.split(b, r"\s+")
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(a.isNull() | b.isNull() | (union == 0), 0.0).otherwise(
        inter / union
    )


def expression_scorer(
    fields: Sequence[str],
    weights: Sequence[float] | None = None,
    bias: float = -2.0,
) -> Callable[[DataFrame], DataFrame]:
    """Logistic score over per-field levenshtein similarity of a_/b_ pairs.
    Deterministic fixed weights (default 4/len per field) — pluggable."""
    if weights is None:
        weights = [4.0 / len(fields)] * len(fields)

    def score(pairs: DataFrame) -> DataFrame:
        z: Column = F.lit(bias)
        for field, w in zip(fields, weights):
            z = z + F.lit(w) * norm_levenshtein_sim(
                F.col(f"a_{field}"), F.col(f"b_{field}")
            )
        return pairs.withColumn("score", F.round(1.0 / (1.0 + F.exp(-z)), 6))

    return score


def pandas_batch_scorer(
    model_bytes: bytes,
    score_fn: Callable[[object, "pandas.DataFrame"], "pandas.Series"],
    out_type: str = "double",
) -> Callable[[DataFrame], DataFrame]:
    """Arbitrary-model batch scorer. ``score_fn(model, pdf) -> Series``
    runs per Arrow batch with the broadcast-deserialized model — the
    Spark equivalent of the reference's multiprocess `do_pairing`
    (mapper/messy.py:347-374)."""

    def score(pairs: DataFrame) -> DataFrame:
        import pandas as pd  # noqa: F401

        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        sc = pairs.sparkSession.sparkContext
        b_model = sc.broadcast(model_bytes)
        # build the output schema structurally — string surgery on
        # simpleString() breaks as soon as a column is itself a struct
        out_schema = StructType(
            list(pairs.schema.fields)
            + [StructField("score", _parse_datatype_string(out_type))]
        )
        _cache: dict[str, object] = {}

        def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import pickle

            if "m" not in _cache:
                _cache["m"] = pickle.loads(b_model.value)
            for pdf in batches:
                pdf = pdf.copy()
                pdf["score"] = score_fn(_cache["m"], pdf)
                yield pdf

        return pairs.mapInPandas(run, schema=out_schema)

    return score


def select_matches(
    scored: DataFrame,
    threshold: float = 0.5,
    left: str = "a_id",
    right: str = "b_id",
) -> DataFrame:
    """Threshold + keep pairs (E6 tail: mapper/messy.py:338-345):
    (from, to, score) above threshold, deduped by argmax per pair."""
    from dropbox_duckdb_playground_spark.operators.relational import (
        argmax_per_group,
    )

    pairs = scored.select(
        F.col(left).alias("from_id"), F.col(right).alias("to_id"), "score"
    ).filter(F.col("score") > threshold)
    return argmax_per_group(pairs, ["from_id", "to_id"], "score")
