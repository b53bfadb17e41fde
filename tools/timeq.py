"""Time individual catalog queries at a given sf via the noop sink.

Usage: python tools/timeq.py [sf_dir] q22_lang_id [q26_...]  (reps via
SPARK_GRAFT_BENCH_REPS, default 3; warms on sf0.001 first).
"""

from __future__ import annotations

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

    spark = get_spark("timeq")
    qs = entrymod.queries()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    for name in names:
        fn = qs[name]
        # warm
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        quiesce(spark)
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            quiesce(spark)
        print(f"TIMEQ {name}: best={min(times)} all={times}", flush=True)


if __name__ == "__main__":
    main()
