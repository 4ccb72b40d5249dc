#!/usr/bin/env python3
"""Synthesize the 1000x scale-probe directory ("sf100": 600M lineitem,
5M documents, 2M embeddings, 10M events; ~13 GB) — the round-9
planning + end-to-end probe the round-8 verdict asked for.

Strictly from the driver's sf0.1 tables, deterministic and seedless —
identical replication semantics to tools/make_sf10.py (FK-preserving
orderkey shifts, ~10%-token near-dup document perturbation, +k*1e-4
embedding perturbation), only the replica counts change. Built
entirely in DuckDB SQL so the 600M-row tables stream to disk without
materializing in memory.

Usage: python3 tools/make_sf100.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf100]
"""
import shutil, sys
from pathlib import Path

import duckdb


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100")
    dst.mkdir(parents=True, exist_ok=True)
    R = 1000  # documents/embeddings/lineitem/orders/customer replicas
    RE = 100  # events replicas (proportional to sf10's 10)

    for t in "region nation supplier part".split():
        p = Path(src) / f"{t}.parquet"
        if p.exists():
            shutil.copy(p, dst / f"{t}.parquet")

    con = duckdb.connect()
    con.execute("SET threads TO 16")
    con.execute("SET preserve_insertion_order=false")
    for t in "lineitem orders customer documents embeddings events".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')")

    mok = con.execute("SELECT MAX(o_orderkey) + 1 FROM orders").fetchone()[0]
    con.execute(f"""
        COPY (SELECT l_orderkey + r.k * {mok} AS l_orderkey,
                     l.* EXCLUDE (l_orderkey)
              FROM lineitem l, range(0, {R}) r(k))
        TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT o_orderkey + r.k * {mok} AS o_orderkey,
                     o.* EXCLUDE (o_orderkey)
              FROM orders o, range(0, {R}) r(k))
        TO '{dst}/orders.parquet' (FORMAT PARQUET)""")

    mck = con.execute("SELECT MAX(c_custkey) + 1 FROM customer").fetchone()[0]
    con.execute(f"""
        COPY (SELECT c_custkey + r.k * {mck} AS c_custkey,
                     c.* EXCLUDE (c_custkey, c_acctbal),
                     CAST(c_acctbal + r.k * 0.01 AS DECIMAL(15,2)) AS c_acctbal
              FROM customer c, range(0, {R}) r(k))
        TO '{dst}/customer.parquet' (FORMAT PARQUET)""")

    n = con.execute("SELECT MAX(doc_id) + 1 FROM documents").fetchone()[0]
    con.execute(f"""
        COPY (
          WITH sp AS (SELECT doc_id, string_split(text, ' ') AS toks,
                             lang, source FROM documents)
          SELECT doc_id + r.k * {n} AS doc_id,
                 CASE WHEN r.k = 0
                      THEN array_to_string(toks, ' ')
                      ELSE array_to_string(list_transform(
                             range(1, len(toks) + 1),
                             i -> CASE WHEN (doc_id * 31 + (i - 1)) % 10 = 0
                                       THEN toks[i] || CAST(r.k AS VARCHAR)
                                       ELSE toks[i] END), ' ')
                 END AS text,
                 lang, source,
                 CAST(length(CASE WHEN r.k = 0
                      THEN array_to_string(toks, ' ')
                      ELSE array_to_string(list_transform(
                             range(1, len(toks) + 1),
                             i -> CASE WHEN (doc_id * 31 + (i - 1)) % 10 = 0
                                       THEN toks[i] || CAST(r.k AS VARCHAR)
                                       ELSE toks[i] END), ' ')
                 END) AS BIGINT) AS n_chars
          FROM sp, range(0, {R}) r(k))
        TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

    m = con.execute("SELECT MAX(vec_id) + 1 FROM embeddings").fetchone()[0]
    con.execute(f"""
        COPY (SELECT vec_id + r.k * {m} AS vec_id,
                     list_transform(embedding,
                       x -> CAST(x + r.k * 0.0001 AS FLOAT)) AS embedding,
                     label
              FROM embeddings, range(0, {R}) r(k))
        TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

    muk = con.execute("SELECT MAX(user_id) + 1 FROM events").fetchone()[0]
    mek = con.execute("SELECT MAX(event_id) + 1 FROM events").fetchone()[0]
    con.execute(f"""
        COPY (SELECT event_id + r.k * {mek} AS event_id,
                     user_id + r.k * {muk} AS user_id,
                     e.* EXCLUDE (event_id, user_id)
              FROM events e, range(0, {RE}) r(k))
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")

    for t in "lineitem orders customer documents embeddings events".split():
        cnt = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {cnt}")
    print(f"SF100_DONE {dst}")


if __name__ == "__main__":
    main()
