"""q42_winnow_fp A/B: posexplode + 3 Window passes over a
partition-by-doc exchange (r9 committed form) vs per-row array
higher-order functions (r13).

Winnowing is a per-document sequence computation (gram hashes from
adjacent tokens, rolling min over w consecutive grams). The old form
posexploded the token arrays into rows and ran lead/min Window execs —
paying an Exchange hashpartitioning(doc_id) + Sort of the ENTIRE token
stream to look at neighbors that were adjacent in the source array all
along. The new form computes the gram-hash array and the window-min
array with `transform`/`slice`/`array_min` inside the row, then
explodes only the fingerprint array into the final distinct — whose
exchange (also paid by the oracle's DISTINCT) becomes the plan's only
shuffle.

Interleaved A/B (old, new, old, new, ...) in ONE session, timed to the
noop sink, median-of-N; per-rep equality asserted on
(count, count-distinct, sum(fp), min, max) over the result set.
Usage: python tools/decompose_q42.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from dropbox_duckdb_playground_spark.operators.text import tokens_col  # noqa: E402
from dropbox_duckdb_playground_spark.session import get_spark, quiesce  # noqa: E402


def old_form(spark, sf_dir, n=3, w=4):
    from dropbox_duckdb_playground_spark.catalog import load
    from dropbox_duckdb_playground_spark.operators.dedup import _hex60

    df = load(spark, sf_dir, "documents")
    key, text = "doc_id", "text"
    toks = df.select(F.col(key), F.posexplode(tokens_col(text)).alias("pos", "tok"))
    ww = Window.partitionBy(key).orderBy("pos")
    gram = F.concat_ws(
        " ", *([F.col("tok")] + [F.lead("tok", i).over(ww) for i in range(1, n)])
    )
    complete = F.lead("tok", n - 1).over(ww).isNotNull()
    hashed = toks.select(
        F.col(key), F.col("pos"), F.when(complete, _hex60(gram)).alias("h")
    ).filter(F.col("h").isNotNull())
    wmin = Window.partitionBy(key).orderBy("pos").rowsBetween(0, w - 1)
    full = F.lead("h", w - 1).over(Window.partitionBy(key).orderBy("pos"))
    return (
        hashed.select(F.col(key), F.min("h").over(wmin).alias("fp"), full.alias("_full"))
        .filter(F.col("_full").isNotNull())
        .select(key, "fp")
        .distinct()
    )


def new_form(spark, sf_dir):
    from dropbox_duckdb_playground_spark.catalog import q42_winnow_fp

    return q42_winnow_fp(spark, sf_dir)


def fingerprint(df):
    return tuple(
        df.agg(
            F.count("*"),
            F.countDistinct("doc_id"),
            F.sum("fp"),
            F.min("fp"),
            F.max("fp"),
        ).collect()[0]
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("decompose_q42")
    for fn in (old_form, new_form):
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        quiesce(spark)
    olds, news = [], []
    for i in range(reps):
        for label, fn, acc in (("old", old_form, olds), ("new", new_form, news)):
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            fpr = fingerprint(df)
            acc.append((dt, fpr))
            print(f"rep{i} {label}: {dt}s fpr={fpr}", flush=True)
            quiesce(spark)
    results = {r for _, r in olds} | {r for _, r in news}
    assert len(results) == 1, f"result mismatch between forms: {results}"
    mo = statistics.median([t for t, _ in olds])
    mn = statistics.median([t for t, _ in news])
    print(
        f"MEDIANS old={mo:.3f}s new={mn:.3f}s delta={mo - mn:+.3f}s "
        f"({(mo - mn) / mo * 100:+.1f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
