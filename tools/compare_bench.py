"""Diff two bench artifacts (BENCH_r{N}.json / bench_out.json /
SF1_BENCH.json) and flag per-query deltas outside the noise band.

Exists because the r8/r9 verdicts both flagged the same structural
failure: two committed artifacts measuring the same code disagreed
(sometimes by 3x) and the repo arbitrated them only in prose. This
tool makes the arbitration mechanical: given two artifacts it prints
the rows whose relative delta exceeds the band, the total drift, and a
one-line verdict, so "do these runs agree?" is a command, not an
archaeology session.

Handles both artifact shapes:
- flat: {"queries": {"q01": 1.23, ...}}            (bench.py output)
- rich: {"queries": {"q01": {"spark": 1.23, ...}}} (sf1_bench output;
  compares the "spark" field, and "oracle" too when both sides have it)

Usage: python tools/compare_bench.py A.json B.json [--band 0.35] [--abs 0.3]
A row is flagged only if BOTH the relative delta exceeds --band AND the
absolute delta exceeds --abs seconds (sub-noise absolute wiggle on
sub-second rows is not drift).
"""

from __future__ import annotations

import json
import sys


def _series(artifact: dict, field: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name, v in artifact.get("queries", {}).items():
        if isinstance(v, dict):
            x = v.get(field)
        else:
            x = v if field == "spark" else None
        if isinstance(x, (int, float)) and x >= 0:
            out[name] = float(x)
    return out


def compare(a: dict, b: dict, band: float, abs_floor: float) -> int:
    n_flagged = 0
    for field in ("spark", "oracle"):
        sa, sb = _series(a, field), _series(b, field)
        common = sorted(set(sa) & set(sb))
        if not common:
            continue
        ta, tb = sum(sa[q] for q in common), sum(sb[q] for q in common)
        drift = abs(ta - tb) / max(min(ta, tb), 1e-9)
        print(f"\n== {field}: {len(common)} shared rows | totals "
              f"{ta:.1f}s vs {tb:.1f}s | total drift {100 * drift:.1f}% ==")
        flagged = []
        for q in common:
            x, y = sa[q], sb[q]
            rel = abs(x - y) / max(min(x, y), 1e-9)
            if rel > band and abs(x - y) > abs_floor:
                flagged.append((rel, q, x, y))
        for rel, q, x, y in sorted(flagged, reverse=True):
            print(f"  DRIFT {q}: {x:.2f}s vs {y:.2f}s ({100 * rel:.0f}%)")
        n_flagged += len(flagged)
        if not flagged:
            print("  all rows within band")
    return n_flagged


def main() -> int:
    argv = sys.argv[1:]
    band, abs_floor, args = 0.35, 0.3, []
    i = 0
    while i < len(argv):
        if argv[i] in ("--band", "--abs"):
            # bounds + numeric checked: a missing or non-numeric flag
            # value prints usage instead of crashing (r10 ADVICE)
            if i + 1 >= len(argv):
                print(__doc__)
                return 2
            try:
                val = float(argv[i + 1])
            except ValueError:
                print(__doc__)
                return 2
            if argv[i] == "--band":
                band = val
            else:
                abs_floor = val
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    with open(args[0]) as fh:
        a = json.load(fh)
    with open(args[1]) as fh:
        b = json.load(fh)
    n = compare(a, b, band, abs_floor)
    print(f"\n{'AGREE' if n == 0 else f'{n} rows outside band'} "
          f"(band {100 * band:.0f}% rel AND >{abs_floor}s abs)")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
