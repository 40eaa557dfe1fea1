"""Generate an sf1-scale replica of /root/testdata/sf0.1 for measurement.

The driver's round-end bench may run at a driver-generated sf1.0 that this
sandbox does not ship; this script rebuilds the measurement-scale replica
described in OPTIMIZATION_r06.md so optimizations can be validated at the
scale the driver actually times:

- TPC-H-ish tables (customer/orders/lineitem/part/supplier/events): 10x
  key-shifted copies.  The customer shift is a multiple of 40*40 rows, so
  every copy lands on the same 40x40 geo lattice the spatial overlay
  derives from c_custkey (150k points over 1,600 distinct positions -- the
  co-located-sensor stress case that made r05's isolation/buddy quadratic).
- documents: 50k docs regenerated from the OBSERVED sf0.1 vocab / length /
  lang / source distributions (seeded), with 2% exact duplicates and 1%
  near duplicates (one-word mutation) so dedup queries keep a realistic
  positive class instead of the degenerate everything-is-a-dup workload a
  plain 10x copy would create.
- embeddings: 20k base vectors drawn per-dim from the observed mean/std
  (seeded) + 2k planted near-clones (small noise) -> 22k vectors, the
  near-dup workload's stress shape.

Usage: python scripts/make_sf1_replica.py [outdir=/tmp/sf1.0]
DuckDB-only (no Spark) so it can run while a bench JVM is idle-free.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
# scale knobs (env): COPIES=100 / DOCS=500000 / VECS=200000 approximates a
# driver-escalated sf10 (pass an outdir like /tmp/sf10.0 so bench.py's
# sf-from-dirname parse records it honestly)
COPIES = int(os.environ.get("REPLICA_COPIES", "10"))
N_DOCS = int(os.environ.get("REPLICA_DOCS", "50000"))
N_VECS = int(os.environ.get("REPLICA_VECS", "20000"))
N_CLONES = N_VECS // 10
SEED = 1234


def rp(name: str) -> str:
    return f"read_parquet('{SRC}/{name}.parquet')"


def replicate_tables(con: duckdb.DuckDBPyConnection, out: str) -> None:
    # key shifts: customer by 16000 (multiple of 1600 -> same lattice,
    # divisible by 40 so lat is preserved exactly per copy)
    shifts = {
        "customer": ("c_custkey", 16_000),
        "orders": ("o_orderkey", 1_600_000),
        "lineitem": ("l_orderkey", 1_600_000),
        "part": ("p_partkey", 20_000),
        "supplier": ("s_suppkey", 1_000),
        "events": ("event_id", 100_000),
    }
    fk = {
        "orders": [("o_custkey", 16_000)],
        "lineitem": [("l_partkey", 20_000), ("l_suppkey", 1_000)],
    }
    for t, (key, shift) in shifts.items():
        cols = [r[0] for r in con.sql(f"describe select * from {rp(t)}").fetchall()]
        parts = []
        for k in range(COPIES):
            sel = []
            for c in cols:
                if c == key:
                    sel.append(f"{c} + {k * shift} AS {c}")
                elif any(c == f0 for f0, _ in fk.get(t, [])):
                    fs = dict(fk[t])[c]
                    sel.append(f"{c} + {k * fs} AS {c}")
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM {rp(t)}")
        q = " UNION ALL ".join(parts)
        con.sql(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.sql(f"select count(*) from read_parquet('{out}/{t}.parquet')").fetchone()[0])
    for t in ("nation", "region"):
        con.sql(f"COPY (SELECT * FROM {rp(t)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")


def regen_documents(con: duckdb.DuckDBPyConnection, out: str) -> None:
    rng = np.random.default_rng(SEED)
    rows = con.sql(f"select text, lang from {rp('documents')}").fetchall()
    by_lang: dict[str, list[str]] = {}
    lens: dict[str, list[int]] = {}
    for text, lang in rows:
        toks = text.split()
        by_lang.setdefault(lang, []).extend(toks)
        lens.setdefault(lang, []).append(len(toks))
    langs = sorted(by_lang)
    lang_p = np.array([sum(1 for _, l in rows if l == lg) for lg in langs], float)
    lang_p /= lang_p.sum()
    vocab = {lg: np.array(by_lang[lg]) for lg in langs}
    texts, doc_lang = [], []
    for i in range(N_DOCS):
        lg = langs[rng.choice(len(langs), p=lang_p)]
        n = int(rng.choice(lens[lg]))
        words = vocab[lg][rng.integers(0, len(vocab[lg]), size=max(n, 1))]
        texts.append(" ".join(words.tolist()))
        doc_lang.append(lg)
    # 2% exact dups, 1% near dups (single-word mutation)
    n_exact, n_near = N_DOCS // 50, N_DOCS // 100
    for j in rng.integers(0, N_DOCS - n_exact - n_near, size=n_exact):
        tgt = int(rng.integers(0, N_DOCS))
        texts[tgt], doc_lang[tgt] = texts[int(j)], doc_lang[int(j)]
    for j in rng.integers(0, N_DOCS - n_exact - n_near, size=n_near):
        tgt = int(rng.integers(0, N_DOCS))
        w = texts[int(j)].split()
        if len(w) > 3:
            w[int(rng.integers(0, len(w)))] = "mutated"
        texts[tgt], doc_lang[tgt] = " ".join(w), doc_lang[int(j)]
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(doc_lang),
            "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")
    print("documents", N_DOCS)


def regen_embeddings(con: duckdb.DuckDBPyConnection, out: str) -> None:
    rng = np.random.default_rng(SEED + 1)
    vecs = np.array(
        con.sql(f"select embedding from {rp('embeddings')}").fetchall()
    )[:, 0]
    m = np.stack(vecs)  # (2000, 64)
    mu, sd = m.mean(axis=0), m.std(axis=0)
    base = rng.normal(mu, sd, size=(N_VECS, m.shape[1])).astype(np.float32)
    src = rng.integers(0, N_VECS, size=N_CLONES)
    clones = base[src] + rng.normal(0, 0.01, size=(N_CLONES, m.shape[1])).astype(
        np.float32
    )
    allv = np.vstack([base, clones])
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(allv)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in allv], pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=len(allv)).tolist(), pa.int32()
            ),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print("embeddings", len(allv))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    replicate_tables(con, out)
    regen_documents(con, out)
    regen_embeddings(con, out)
    open(f"{out}/_DONE", "w").close()
    print("wrote", out)


if __name__ == "__main__":
    main()
