"""Steady-state sf1 bench: warm best-of-2 seconds for BOTH engines
(Spark noop-write vs DuckDB oracle fetchall) on the sf1 mirror rows.

Exists to reconcile two committed-but-differently-conditioned numbers:
SCALING.md's sf1 column is warm best-of-N in a long-lived session,
while the sf1 correctness mirror runs each query as a COLD single-shot
subprocess (JVM start + JIT + first-scan page-cache misses) — q92 read
6.3s in one and 199.2s in the other. This tool puts both engines on
the same steady-state footing (shape-warmed session, best of 2) and
writes ONE JSON artifact the 100 TB amortization argument can cite.

Excluded rows mirror tools/sf1_mirror.EXCLUDED (output-size-infeasible
uncapped baselines), recorded in the artifact with their reasons.

Usage: python tools/sf1_bench.py [out_json]   (default SF1_BENCH.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from scaling import SF1_QUERIES  # noqa: E402
from sf1_mirror import EXCLUDED  # noqa: E402

SF1 = os.path.join(REPO, "testdata_sf1")
SF_WARM = "/root/testdata/sf0.01"
ORACLE_TIMEOUT = 900  # seconds per query subprocess (2 reps inside)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_ORACLE_RUNNER = r"""
import json, os, sys, time
import duckdb
sf1, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
# long queries trigger duckdb's stdout progress bar, which would glue
# itself to the JSON line below
con.execute("SET enable_progress_bar = false")
for t in %r:
    p = os.path.join(sf1, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
best = None
for _ in range(2):
    t0 = time.time()
    con.execute(sql).fetchall()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"oracle": round(best, 3)}))
""" % (TABLES,)


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SF1_BENCH.json"
    )
    import __spark_entry__ as entrymod
    from dropbox_duckdb_playground_spark.session import get_spark, quiesce

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [q for q in SF1_QUERIES if q in qs and q not in EXCLUDED]

    spark = get_spark("sf1bench")
    spark.sparkContext.setLogLevel("ERROR")

    def fresh_session():
        nonlocal spark
        spark.stop()
        spark = get_spark("sf1bench")
        spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for i, name in enumerate(names):
        # same isolation cadence as tools/scaling.py: restart the JVM
        # every few heavy rows, and immediately after any >15s row, so
        # accumulated GC/shuffle-tracker state cannot inflate later rows
        if i % 6 == 0:
            fresh_session()
        fn = qs[name]
        try:
            fn(spark, SF_WARM).write.format("noop").mode("overwrite").save()
            quiesce(spark)
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, SF1).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                quiesce(spark)
            results[name] = {"spark": round(best, 3)}
            if best > 15:
                fresh_session()
        except Exception as exc:
            results[name] = {"spark": None, "spark_err": str(exc)[:200]}
            fresh_session()
        print(f"SF1BENCH {name}: spark={results[name].get('spark')}", flush=True)

    for name in names:
        sql = oracles.get(name)
        if sql is None:
            results[name]["oracle"] = None
            results[name]["oracle_err"] = "rows-only query (no oracle)"
            continue
        try:
            r = subprocess.run(
                [sys.executable, "-c", _ORACLE_RUNNER, SF1],
                input=sql,
                capture_output=True,
                text=True,
                timeout=ORACLE_TIMEOUT,
                cwd=REPO,
            )
            if r.returncode == 0:
                # parse from the last '{' — belt-and-braces against any
                # residual engine chatter on stdout
                payload = r.stdout.strip()
                results[name]["oracle"] = json.loads(
                    payload[payload.rfind("{"):]
                )["oracle"]
            else:
                results[name]["oracle"] = None
                results[name]["oracle_err"] = r.stderr.strip()[-200:]
        except subprocess.TimeoutExpired:
            results[name]["oracle"] = None
            results[name]["oracle_err"] = f"timeout >{ORACLE_TIMEOUT}s"
        print(
            f"SF1BENCH {name}: oracle={results[name].get('oracle')}",
            flush=True,
        )

    both = [
        (v["spark"], v["oracle"])
        for v in results.values()
        if v.get("spark") is not None and v.get("oracle") is not None
    ]
    artifact = {
        "metric": "sf1_steady_state_wall",
        "unit": "sec",
        "sf": 1,
        "protocol": "shape-warmed session, best-of-2 per engine; "
        "Spark noop write vs DuckDB fetchall on the same parquet",
        "spark_total": round(sum(s for s, _ in both), 3),
        "oracle_total": round(sum(o for _, o in both), 3),
        "ratio": round(
            sum(s for s, _ in both) / max(sum(o for _, o in both), 1e-9), 3
        ),
        "n_compared": len(both),
        "queries": results,
        "excluded": EXCLUDED,
    }
    with open(out_json, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"\nSF1_BENCH: spark {artifact['spark_total']}s vs oracle "
        f"{artifact['oracle_total']}s -> {artifact['ratio']}x "
        f"({len(both)} rows) -> {out_json}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
