"""Decompose the committed bench ratio (Spark total / DuckDB-oracle
warm total) into its parts, from bench_out.json ONLY — no in-session
timers, so every number here is reproducible from the committed
artifact.

Model: spark_t(q) = floor + data_t(q) [+ handshake(q)].

- floor: the per-query scheduling/launch constant of local[32] Spark —
  job submission, 32-task stage launch, noop-sink commit. Estimated as
  the MEDIAN spark time of the 25 cheapest queries (queries whose
  oracle runs in ~1ms; their Spark time is almost purely the floor).
  This constant does not exist per-query at cluster scale: it
  amortizes over long-running stages (SCALING.md's overhead-bound rows
  are exactly the queries whose slope10 ~ 1).
- handshake: queries with a driver-side staging/collect step
  (model-fit or filter-build) pay extra fixed jobs; listed explicitly.
- data_t: what remains — the part that actually races DuckDB.

Usage: python tools/ratio.py [bench_out.json] [out_md]   (writes RATIO.md)
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose Spark plan includes a driver-side staged-model or
# filter-build handshake (extra eager jobs before the main plan):
HANDSHAKE = {
    "q62_ivf_ann": "k-means fit + staged-parquet quantizer",
    "q79_semantic_dedup": "k-means fit + staged-parquet quantizer",
    "q107_pq_ann": "PQ codebook fit + staged parquet",
    "q95_bloom_contamination": "bench-bits collect -> literal bitmap",
    "q92_pagerank": "edge/degree materialize + node-count gate jobs",
}

FAMILIES = [
    ("tpch-relational", lambda n: any(
        k in n for k in ("tpch", "pricing", "order", "cust", "nation",
                         "union", "semi", "exists", "remap", "window",
                         "rollup", "cube", "grouping", "pivot", "unpivot",
                         "percentile", "median", "topk_per", "skew",
                         "dormant", "part_type", "revenue", "profit",
                         "returns", "shipping", "market", "volume",
                         "discount", "promo", "brand", "latest", "best"))),
    ("dedup-similarity", lambda n: any(
        k in n for k in ("jaccard", "minhash", "lsh", "simhash", "hamming",
                         "neardup", "dedup", "contamination", "cosine",
                         "ivf", "pq_ann", "knn", "semantic", "chunk_dedup",
                         "er_doc", "fuzzy", "components", "cluster"))),
    ("text-ir", lambda n: any(
        k in n for k in ("lang", "quality", "token", "repetition", "boiler",
                         "pii", "bpe", "winnow", "vocab", "idf", "bm25",
                         "positional", "pmi", "bigram", "fingerprint",
                         "media", "frame", "fertility", "zorder", "array",
                         "json", "nested"))),
    ("sketch-graph-ts", lambda n: True),
]


def family(name: str) -> str:
    for fam, pred in FAMILIES:
        if pred(name):
            return fam
    return "other"


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "bench_out.json")
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "RATIO.md")
    return main_from(path, out_md)


def main_from(path: str, out_md: str) -> int:
    with open(path) as fh:
        b = json.loads(fh.read().strip())
    sq: dict[str, float] = {k: v for k, v in b["queries"].items() if v >= 0}
    oq: dict[str, float] = {k: v for k, v in b.get("oracle_queries", {}).items() if v >= 0}
    names = [n for n in sq if n in oq]

    cheapest = sorted(names, key=lambda n: oq[n])[:25]
    floor = statistics.median(sq[n] for n in cheapest)

    rows = []
    fam_tot: dict[str, list[float]] = {}
    for n in names:
        s, o = sq[n], oq[n]
        data = max(s - floor, 0.0)
        rows.append((n, s, o, data))
        fam_tot.setdefault(family(n), [0.0, 0.0, 0.0])
        ft = fam_tot[family(n)]
        ft[0] += s
        ft[1] += o
        ft[2] += data

    total_s = sum(sq[n] for n in names)
    total_o = sum(oq[n] for n in names)
    # Headline denominator: the BEST oracle total the artifact records.
    # The r9 driver run read warm (100.1s) > cold (68.2s) — host drift
    # inside the bench — so taking the warm column blindly would flatter
    # the ratio; min() keeps the conservative honest denominator
    # (r9 VERDICT item 3).
    # Artifact-level totals (cold/warm) sum over every query whose
    # oracle succeeded; total_o sums over `names` (queries where BOTH
    # engines succeeded). Comparing them against a numerator restricted
    # to `names` is only sound when the two sets coincide — otherwise
    # the min() would pick a denominator covering a different workload
    # (r10 ADVICE). oq's keys are exactly the oracle-succeeded set.
    oracle_candidates = [total_o]
    if set(names) == set(oq):
        oracle_candidates += [
            b[k] for k in ("oracle_total_cold", "oracle_total_warm")
            if k in b
        ]
    total_o_best = min(oracle_candidates)
    total_data = sum(r[3] for r in rows)
    floor_total = floor * len(names)
    hs = [(n, HANDSHAKE[n]) for n in names if n in HANDSHAKE]

    lines = [
        "# RATIO — where the Spark-vs-oracle gap lives",
        "",
        f"Derived from `{os.path.basename(path)}` (sf={b.get('sf')}) by",
        "`tools/ratio.py`; re-run it after any bench to regenerate.",
        "",
        f"- Spark total: **{total_s:.1f}s**, oracle best total"
        f" (min of warm {total_o:.1f}s"
        + (f", cold {b['oracle_total_cold']:.1f}s"
           if "oracle_total_cold" in b and set(names) == set(oq) else "")
        + f"): **{total_o_best:.1f}s** -> ratio"
        f" **{total_s / total_o_best:.2f}x**",
        f"- Estimated per-query floor (median Spark time of the 25"
        f" oracle-cheapest queries): **{floor:.2f}s**; x{len(names)}"
        f" queries = **{floor_total:.1f}s** of the Spark total"
        f" ({100 * floor_total / total_s:.0f}%).",
        f"- Residual (data) time: **{total_data:.1f}s** vs oracle"
        f" per-query (warm) total {total_o:.1f}s -> **data-time ratio"
        f" {total_data / total_o:.2f}x** (per-query oracle times exist"
        f" only for the warm pass, so the decomposition below uses the"
        f" warm column even when the cold total is smaller).",
        "",
        "The floor is a local[32] artifact: job submission + 32-task",
        "stage launch + noop commit per query. On a cluster it amortizes",
        "over real stage runtimes (SCALING.md's overhead-bound rows are",
        "exactly the floor-dominated queries: slope10 ~ 1 as data grows",
        "10x). DuckDB pays no equivalent: it is an in-process library",
        "call with ~1ms dispatch.",
        "",
        "## Handshake queries (extra driver-side staging jobs)",
        "",
    ]
    for n, why in hs:
        lines.append(f"- `{n}`: {why} — Spark {sq[n]:.2f}s vs oracle"
                     f" {oq[n]:.2f}s (oracle replays only the relational"
                     f" tail where staging applies)")
    lines += [
        "",
        "## Per-family decomposition",
        "",
        "| family | n | spark s | oracle s | data s (minus floor) |"
        " data ratio |",
        "|---|---|---|---|---|---|",
    ]
    for fam, (s, o, d) in sorted(fam_tot.items()):
        n_fam = sum(1 for r in rows if family(r[0]) == fam)
        ratio = d / o if o > 0 else float("inf")
        lines.append(
            f"| {fam} | {n_fam} | {s:.1f} | {o:.1f} | {d:.1f} |"
            f" {ratio:.2f}x |"
        )
    lines += [
        "",
        "## Top-10 by data time (the real optimization targets)",
        "",
        "| query | spark s | oracle s | data s | spark/oracle |",
        "|---|---|---|---|---|",
    ]
    for n, s, o, d in sorted(rows, key=lambda r: -r[3])[:10]:
        lines.append(
            f"| {n} | {s:.2f} | {o:.2f} | {d:.2f} |"
            f" {s / o if o > 0 else float('inf'):.1f}x |"
        )
    lines.append("")
    with open(out_md, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out_md}: floor={floor:.2f}s, data ratio "
          f"{total_data / total_o:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
