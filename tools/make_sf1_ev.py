#!/usr/bin/env python3
"""Synthesize the 10x EVENTS/CUSTOMER scale-probe directory.

Companion to make_sf1.py (documents/embeddings) and make_sf1_rel.py
(lineitem/orders): this one replicates the behavioral tables so the
event-analytics gates (attribution, CUPED, funnel family) and the
point-cloud gates (hexbin, nn_within) get a true 10x probe.
  - events: 10 replicas; replica k shifts user_id and event_id by
    k*(max+1) so per-user streams keep their exact structure (the
    probe scales the USER population, which is how event data grows).
  - customer: 10 replicas with shifted c_custkey (new lattice points
    for the spatial gates) and acctbal perturbed +k cents so cell sums
    are not trivially 10x.
  - everything else: copied unchanged.

Usage: python3 tools/make_sf1_ev.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1ev]
"""
import shutil, sys
from pathlib import Path

import duckdb


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1ev")
    dst.mkdir(parents=True, exist_ok=True)

    for t in "region nation supplier part orders lineitem documents embeddings".split():
        p = Path(src) / f"{t}.parquet"
        if p.exists():
            shutil.copy(p, dst / f"{t}.parquet")

    con = duckdb.connect()
    nu = con.execute(
        f"SELECT MAX(user_id) + 1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
    ne = con.execute(
        f"SELECT MAX(event_id) + 1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT event_id + k * {ne} AS event_id, ts,
                 user_id + k * {nu} AS user_id, event_type, value, props
          FROM read_parquet('{src}/events.parquet'), range(0, 10) r(k)
          ORDER BY event_id
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

    nc = con.execute(
        f"SELECT MAX(c_custkey) + 1 FROM read_parquet('{src}/customer.parquet')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT c_custkey + k * {nc} AS c_custkey, c_name, c_nationkey,
                 ROUND(c_acctbal + k * 0.01, 2) AS c_acctbal, c_mktsegment
          FROM read_parquet('{src}/customer.parquet'), range(0, 10) r(k)
          ORDER BY c_custkey
        ) TO '{dst}/customer.parquet' (FORMAT PARQUET)""")

    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}/events.parquet')").fetchone()[0]
    m = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}/customer.parquet')").fetchone()[0]
    print(f"events={n} customers={m} -> {dst}")


if __name__ == "__main__":
    main()
