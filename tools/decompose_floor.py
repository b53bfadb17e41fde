"""Decompose the per-query bench floor: construction vs execution.

RATIO.md attributes ~30% of bench wall to a ~0.23s/query floor. This
probe splits that floor into its two serial components for every
catalog query:

- ``build``  — time for ``fn(spark, sf_dir)`` to RETURN the DataFrame:
  pure driver-side Python + py4j plan construction (no job has run).
- ``exec``   — time for the noop write of the already-built frame:
  analysis/optimization/codegen + actual job execution.

If ``build`` is a material slice, the fix is fewer py4j round trips in
query construction (batch expressions through one ``F.expr`` string,
``selectExpr`` over chained ``withColumn``), not Spark tuning — a
driver-side cost that scales with query count, not data size.

Usage: python tools/decompose_floor.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    spark = get_spark("decompose_floor")
    qs = entrymod.queries()
    if names:
        qs = {n: qs[n] for n in names}
    warm_dir = "/root/testdata/sf0.001"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    rows = []
    for name, fn in qs.items():
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        quiesce(spark)
        best_b, best_e = None, None
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            b, e = t1 - t0, t2 - t1
            # keep the rep with the smallest TOTAL (bench methodology),
            # reporting its split
            if best_b is None or (b + e) < (best_b + best_e):
                best_b, best_e = b, e
            quiesce(spark)
        rows.append((name, round(best_b, 3), round(best_e, 3)))
        print(f"FLOOR {name}: build={best_b:.3f} exec={best_e:.3f}", flush=True)
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    print(
        json.dumps(
            {
                "metric": "floor_decomposition",
                "n_queries": len(rows),
                "build_total_sec": round(tb, 2),
                "exec_total_sec": round(te, 2),
                "rows": {r[0]: [r[1], r[2]] for r in rows},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
