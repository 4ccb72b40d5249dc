#!/usr/bin/env python3
"""Synthesize the 100x scale-probe directory ("sf10": 60M lineitem,
500k documents) — the round-8 first-100x probe.

Strictly from the driver's sf0.1 tables, deterministic and seedless,
same replication semantics as the 10x probes (make_sf1*.py) but built
entirely in DuckDB SQL so the 60M-row tables generate in seconds:
  - lineitem + orders: 100 replicas, orderkeys shifted by
    k * (max_orderkey + 1) — FK preserved per replica; each customer
    gets 100x orders.
  - customer: 100 replicas with shifted c_custkey (new lattice points
    for the spatial gates) and acctbal perturbed +k cents.
  - documents: 100 replicas with shifted doc_ids; replicas k>0 get the
    ~10%-of-tokens perturbation (token -> token+str(k) where
    (doc_id*31 + i) % 10 == 0), so replicas are NEAR-dups and dedup
    clusters grow to ~100 members.
  - embeddings: 100 replicas with shifted vec_ids, +k*1e-4 per-replica
    perturbation (float32).
  - events: 10 replicas with shifted user_id/event_id (enough scale
    for the window-sketch gates without dwarfing the probe's poles).
  - region/nation/supplier/part: copied unchanged.

Usage: python3 tools/make_sf10.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf10]
"""
import shutil, sys
from pathlib import Path

import duckdb


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10")
    dst.mkdir(parents=True, exist_ok=True)
    R = 100

    for t in "region nation supplier part".split():
        p = Path(src) / f"{t}.parquet"
        if p.exists():
            shutil.copy(p, dst / f"{t}.parquet")

    con = duckdb.connect()
    con.execute("SET threads TO 16")
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
              FROM events e, range(0, 10) r(k))
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")

    for t in "lineitem orders customer documents embeddings events".split():
        cnt = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {cnt}")
    print(f"SF10_DONE {dst}")


if __name__ == "__main__":
    main()
