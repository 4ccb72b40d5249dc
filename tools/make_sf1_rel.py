#!/usr/bin/env python3
"""Synthesize a 10x RELATIONAL scale-probe directory (companion to
make_sf1.py, which targets documents/embeddings and keeps the
relational tables at sf0.1 — so relational gates get no scale evidence
from it).

Strictly from the driver's sf0.1 tables, deterministic and seedless:
  - lineitem + orders: replicated 10x with orderkeys shifted by
    k * (max_orderkey + 1) so the FK relationship is preserved per
    replica; customer/supplier/part keys unchanged (each customer gets
    10x orders — realistic growth, and dimension joins stay identical).
  - every other table: copied unchanged.

Usage: python3 tools/make_sf1_rel.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1rel]
"""
import shutil, sys
from pathlib import Path

import duckdb


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1rel")
    dst.mkdir(parents=True, exist_ok=True)

    for t in "region nation customer supplier part events documents embeddings".split():
        p = Path(src) / f"{t}.parquet"
        if p.exists():
            shutil.copy(p, dst / f"{t}.parquet")

    con = duckdb.connect()
    shift = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')"
    ).fetchone()[0]

    con.execute(f"""
        COPY (
          SELECT o_orderkey + r.k * {shift} AS o_orderkey,
                 o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{src}/orders.parquet'), range(0, 10) r(k)
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT l_orderkey + r.k * {shift} AS l_orderkey,
                 l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{src}/lineitem.parquet'), range(0, 10) r(k)
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}/lineitem.parquet')").fetchone()[0]
    print(f"SF1REL_DONE {dst}: {n} lineitem rows")


if __name__ == "__main__":
    main()
