"""Generate sf1-scale documents / embeddings / events for the scaling
harness (tools/scaling.py), extending the driver's sf0.001/0.01/0.1
progression by one more decade.

The driver's testdata is read-only and stops at sf0.1, so the sf1
tables are SYNTHESIZED here — statistically faithful, not replicated:
naive ``UNION ALL of 10 copies`` would manufacture 10-way exact/near
duplicate groups and quadratically inflate every similarity-family
output (minhash/jaccard/simhash/cosine pair counts), which would make
linear algorithms look superlinear. Instead:

- documents: fresh docs sampled from the measured per-language token
  frequencies, source mix, and an empirical resample of the observed
  token-length distribution (50,000 docs = 10x sf0.1), PLUS a
  Heaps-law hapax tail (r11 verdict #3): the driver corpus draws from
  a 31-token-per-language vocabulary, so at sf0.1+ every 3-gram
  repeats corpus-wide and any boilerplate gate (q100/q120
  ``boiler_ratio <= 0.95``) saturates to 0 keepers — both engines
  agree, but the 1000x hash check compares empty sets. Real corpora
  grow vocabulary with size (Heaps' law; hapax legomena are ~half of
  the distinct types), so TAIL_MIX of the docs replace a per-doc
  TAIL_RANGE fraction of token slots with corpus-unique tail tokens
  (``zq<counter>``). Those docs carry genuinely unique 3-grams
  (boiler_ratio well below the gate) while the rest stay fully
  templated, so the keep/drop gate discriminates at sf1 and q120's
  manifest is non-degenerate.
- embeddings: fresh vectors from the measured per-label centroid +
  per-dimension residual std (8,000 = 4x sf0.1, matching the driver's
  own 4x-per-decade progression for this table).
- events: fresh rows with empirically resampled value/ts marginals,
  user_id scaled to 15,000 (10x), props.k kept in the driver's fixed
  0..99 range so q43's doc-ref semi-join selectivity is preserved.

Deterministic (seed 4242). Output: <repo>/testdata_sf1/*.parquet
(gitignored). Usage: python tools/gen_sf1.py
"""

from __future__ import annotations

import json
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, "testdata_sf1")
SEED = 4242

N_DOCS = 50_000
N_VECS = 8_000
N_EVENTS = 1_000_000
N_USERS = 15_000

# Heaps-law hapax tail for documents (see module docstring): TAIL_MIX of
# docs get a per-doc tail fraction drawn uniformly from TAIL_RANGE; each
# tail slot becomes a corpus-unique token. 0.45 * U(0.05, 0.30) keeps
# the expected unique-3-gram share of a tailed doc at ~3*f in (15%,
# 66%) — comfortably under the 0.95 boilerplate gate — while the other
# 55% of docs stay fully templated (boiler ~1.0, dropped), so the gate
# splits the corpus instead of saturating.
TAIL_MIX = 0.45
TAIL_RANGE = (0.05, 0.30)


def gen_documents(con: duckdb.DuckDBPyConnection, rng: np.random.Generator) -> None:
    langs = con.sql(
        f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    sources = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT source FROM '{SRC}/documents.parquet' ORDER BY 1"
        ).fetchall()
    ]
    tok_freq = con.sql(
        f"""
        SELECT lang, tok, count(*) AS c FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM '{SRC}/documents.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    lens = np.array(
        [
            r[0]
            for r in con.sql(
                f"SELECT len(string_split(text, ' ')) FROM '{SRC}/documents.parquet'"
            ).fetchall()
        ]
    )
    by_lang: dict[str, tuple[list[str], np.ndarray]] = {}
    for lang, _ in langs:
        rows = [(t, c) for lg, t, c in tok_freq if lg == lang]
        toks = [t for t, _ in rows]
        p = np.array([c for _, c in rows], dtype=np.float64)
        by_lang[lang] = (toks, p / p.sum())

    total = sum(c for _, c in langs)
    texts, lang_col, src_col = [], [], []
    n_tail_tokens = 0  # global counter -> tail tokens corpus-unique
    for lang, c in langs:
        n = round(N_DOCS * c / total)
        toks, p = by_lang[lang]
        doc_lens = rng.choice(lens, size=n)  # empirical resample
        flat = rng.choice(len(toks), size=int(doc_lens.sum()), p=p)
        offs = np.concatenate([[0], np.cumsum(doc_lens)]).astype(np.int64)
        # Heaps-law hapax tail: per-doc fraction of slots replaced by
        # corpus-unique tokens (0 for 1-TAIL_MIX of the docs).
        tail_frac = np.where(
            rng.random(n) < TAIL_MIX,
            rng.uniform(TAIL_RANGE[0], TAIL_RANGE[1], size=n),
            0.0,
        )
        for i in range(n):
            words = [toks[j] for j in flat[offs[i] : offs[i + 1]]]
            if tail_frac[i] > 0 and words:
                mask = rng.random(len(words)) < tail_frac[i]
                for k in np.nonzero(mask)[0]:
                    words[int(k)] = f"zq{n_tail_tokens:06d}"
                    n_tail_tokens += 1
            texts.append(" ".join(words))
            lang_col.append(lang)
            src_col.append(sources[int(rng.integers(len(sources)))])
    doc_id = np.arange(len(texts), dtype=np.int64)
    order = rng.permutation(len(texts))  # shuffle so langs interleave
    tbl = pa.table(
        {
            "doc_id": doc_id,
            "text": pa.array([texts[i] for i in order]),
            "lang": pa.array([lang_col[i] for i in order]),
            "source": pa.array([src_col[i] for i in order]),
            "n_chars": pa.array(
                [len(texts[i]) for i in order], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, f"{OUT}/documents.parquet", row_group_size=5000)


def gen_embeddings(con: duckdb.DuckDBPyConnection, rng: np.random.Generator) -> None:
    rows = con.sql(
        f"SELECT label, embedding FROM '{SRC}/embeddings.parquet'"
    ).fetchall()
    by_label: dict[int, list[list[float]]] = {}
    for lb, v in rows:
        by_label.setdefault(lb, []).append(v)
    labels = sorted(by_label)
    total = len(rows)
    out_vecs, out_labels = [], []
    for lb in labels:
        X = np.asarray(by_label[lb], dtype=np.float64)
        mu, sd = X.mean(axis=0), X.std(axis=0)
        n = round(N_VECS * len(X) / total)
        V = mu + rng.standard_normal((n, X.shape[1])) * sd
        out_vecs.append(V.astype(np.float32))
        out_labels.extend([lb] * n)
    V = np.concatenate(out_vecs)
    order = rng.permutation(len(V))
    tbl = pa.table(
        {
            "vec_id": np.arange(len(V), dtype=np.int64),
            "embedding": pa.array(
                [V[i].tolist() for i in order], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                [out_labels[i] for i in order], type=pa.int32()
            ),
        }
    )
    pq.write_table(tbl, f"{OUT}/embeddings.parquet", row_group_size=2000)


def gen_events(con: duckdb.DuckDBPyConnection, rng: np.random.Generator) -> None:
    etypes = con.sql(
        f"SELECT event_type, count(*) FROM '{SRC}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    values = np.array(
        [r[0] for r in con.sql(f"SELECT value FROM '{SRC}/events.parquet'").fetchall()]
    )
    ts_lo, ts_hi = con.sql(
        f"SELECT min(ts), max(ts) FROM '{SRC}/events.parquet'"
    ).fetchall()[0]
    names = [t for t, _ in etypes]
    p = np.array([c for _, c in etypes], dtype=np.float64)
    p /= p.sum()
    lo_us = np.datetime64(ts_lo, "us").astype(np.int64)
    hi_us = np.datetime64(ts_hi, "us").astype(np.int64)
    ts = rng.integers(lo_us, hi_us, size=N_EVENTS)
    tbl = pa.table(
        {
            "event_id": np.arange(N_EVENTS, dtype=np.int64),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": rng.integers(0, N_USERS, size=N_EVENTS),
            "event_type": pa.array(
                np.array(names, dtype=object)[
                    rng.choice(len(names), size=N_EVENTS, p=p)
                ].tolist()
            ),
            "value": rng.choice(values, size=N_EVENTS),  # empirical resample
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=N_EVENTS)]
            ),
        }
    )
    pq.write_table(tbl, f"{OUT}/events.parquet", row_group_size=100_000)


def gen_relational(con: duckdb.DuckDBPyConnection) -> None:
    """TPC-H-ish tables at 10x via coherent key-offset replication.

    Replication is statistically safe for join/agg/window shapes (no
    similarity semantics to inflate): every replica is a fresh key range
    with the same value distributions, so joins stay 1:N with the same
    fan-out and group sizes grow linearly."""
    strides = {}
    for t, k in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("part", "p_partkey"), ("supplier", "s_suppkey")]:
        strides[t] = con.sql(
            f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
    reps = "SELECT unnest(range(10)) AS r"
    copies = {
        "customer": f"""
            SELECT c_custkey + r * {strides['customer']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', ({reps})""",
        "orders": f"""
            SELECT o_orderkey + r * {strides['orders']} AS o_orderkey,
                   o_custkey + r * {strides['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', ({reps})""",
        "lineitem": f"""
            SELECT l_orderkey + r * {strides['orders']} AS l_orderkey,
                   l_partkey + r * {strides['part']} AS l_partkey,
                   l_suppkey + r * {strides['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', ({reps})""",
        "supplier": f"""
            SELECT s_suppkey + r * {strides['supplier']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet', ({reps})""",
        "part": f"""
            SELECT p_partkey + r * {strides['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet', ({reps})""",
        "region": f"SELECT * FROM '{SRC}/region.parquet'",
        "nation": f"SELECT * FROM '{SRC}/nation.parquet'",
    }
    for t, q in copies.items():
        con.sql(
            f"COPY ({q}) TO '{OUT}/{t}.parquet'"
            " (FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(SEED)
    gen_documents(con, rng)
    gen_embeddings(con, rng)
    gen_events(con, rng)
    gen_relational(con)
    for f in sorted(os.listdir(OUT)):
        path = os.path.join(OUT, f)
        print(f, os.path.getsize(path) // 1024, "KiB")


if __name__ == "__main__":
    main()
