"""Dump ``explain("formatted")`` for catalog queries to files.

Optimization-round evidence trail: before touching a query, snapshot its
physical plan; after the change, snapshot again under a different tag so
the plan diff (Exchange count, join strategy, PushedFilters, Python
stages) is reviewable without running Spark.

Usage:
    python tools/dump_plans.py <out_dir> <tag> [query ...]

Writes ``<out_dir>/<query>_<tag>.txt`` for each named query (default:
every catalog query). Plans are built at $SPARK_GRAFT_SF_DIR (default
sf0.1) — the bench scale, so size-estimate-driven decisions (broadcast
thresholds) match what the bench executes. Note these are pre-execution
plans (``AdaptiveSparkPlan isFinalPlan=false``): AQE may still coalesce
partitions or convert join strategies at runtime.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.audit_plans import plan_str  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: dump_plans.py <out_dir> <tag> [query ...]")
    out_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from dropbox_duckdb_playground_spark import catalog
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = catalog.queries()
    if names:
        missing = [n for n in names if n not in qs]
        if missing:
            sys.exit(f"unknown queries: {missing}")
        qs = {n: qs[n] for n in names}

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name, fn in qs.items():
        try:
            p = plan_str(fn(spark, sf_dir))
        except Exception as exc:  # keep dumping the rest
            p = f"PLAN BUILD FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(p if p.endswith("\n") else p + "\n")
        print(path, flush=True)
        quiesce(spark)
    spark.stop()


if __name__ == "__main__":
    main()
