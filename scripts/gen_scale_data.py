#!/usr/bin/env python3
"""Derive a 10x ("sf1") dataset from the driver's sf0.1 fixtures for the
SCALE.md scaling probe — PERF measurement only; the correctness gate
stays on the driver fixtures.

Each table is K=10 key-shifted copies of sf0.1 (FK relationships
preserved: the same shift applies to a key everywhere it appears; the
nation/region dims copy through unshifted). Copy k>0 of a document gets
a ' copy<k>' text suffix (n_chars adjusted), so cross-copy pairs are
NEAR-duplicates — a ~90%-duplicated corpus, the density real crawl data
shows a dedup pipeline. Embeddings replicate exactly (duplicate-vector
density for the ANN probes).

Usage: python3 scripts/gen_scale_data.py [SRC_DIR OUT_DIR K]
"""
import pathlib
import sys

import duckdb

SRC = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
OUT = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1")
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

SHIFTS = {
    "customer": {"c_custkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000, "l_partkey": 10_000_000,
                 "l_suppkey": 1_000_000},
    "part": {"p_partkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "nation": {},
    "region": {},
}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table, shifts in SHIFTS.items():
        src = SRC / f"{table}.parquet"
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        copies = 1 if not shifts and table in ("nation", "region") else K
        arms = []
        for k in range(copies):
            sel = []
            for c in cols:
                if c in shifts:
                    sel.append(f"{c} + {k * shifts[c]} AS {c}")
                elif table == "documents" and c == "text" and k > 0:
                    sel.append(f"text || ' copy{k}' AS text")
                elif table == "documents" and c == "n_chars" and k > 0:
                    sel.append(f"n_chars + {len(f' copy{k}')} AS n_chars")
                else:
                    sel.append(c)
            arms.append(f"SELECT {', '.join(sel)} FROM '{src}'")
        sql = "\nUNION ALL\n".join(arms)
        con.sql(f"COPY ({sql}) TO '{OUT / (table + '.parquet')}' "
                "(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{OUT / (table + '.parquet')}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
