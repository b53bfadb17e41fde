"""Merge per-row sf1_bench artifacts into SF1_BENCH.json.

Rows measured by tools/sf1_bench.py are independently valid: the
protocol interleaves engines WITHIN each row (drift hits both columns
equally) and stamps per-row loadavg + rep lists, so a row measured in
a later session can replace or extend an existing artifact without
invalidating its other rows. This tool takes a base artifact and one
or more partial artifacts (e.g. a new-queries run or a quiet-host
re-measure), overlays their rows, recomputes the totals/ratio over
the merged set, and records the provenance.

Usage: python tools/merge_sf1_bench.py BASE.json PART.json [PART2.json ...]
       (rewrites BASE.json in place; prints the new headline)
"""

from __future__ import annotations

import json
import sys


def merge(base: dict, parts: list[dict]) -> dict:
    for part in parts:
        base["queries"].update(part.get("queries", {}))
        for name in part.get("excluded", {}):
            base.setdefault("excluded", {}).setdefault(
                name, part["excluded"][name]
            )
    both = [
        (v["spark"], v["oracle"])
        for v in base["queries"].values()
        if v.get("spark") is not None and v.get("oracle") is not None
    ]
    base["spark_total"] = round(sum(s for s, _ in both), 3)
    base["oracle_total"] = round(sum(o for _, o in both), 3)
    base["ratio"] = round(
        base["spark_total"] / max(base["oracle_total"], 1e-9), 3
    )
    base["n_compared"] = len(both)
    base["merged_rows_note"] = (
        "rows measured across sessions via tools/merge_sf1_bench.py; "
        "each row is self-contained (interleaved engines, per-row "
        "loadavg + rep lists) — see git history for per-merge inputs"
    )
    return base


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base_path, part_paths = sys.argv[1], sys.argv[2:]
    with open(base_path) as fh:
        base = json.load(fh)
    parts = []
    for p in part_paths:
        with open(p) as fh:
            parts.append(json.load(fh))
    base = merge(base, parts)
    with open(base_path, "w") as fh:
        json.dump(base, fh, indent=1)
    print(
        f"merged {len(part_paths)} artifact(s) -> {base_path}: spark "
        f"{base['spark_total']}s vs oracle {base['oracle_total']}s -> "
        f"{base['ratio']}x ({base['n_compared']} rows)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
