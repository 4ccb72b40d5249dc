#!/usr/bin/env python3
"""Synthesize the 10x scale-probe directory (see BASELINE.md "sf1").

No sf1 ships with the driver, so build one strictly from the driver's
sf0.1 tables (deterministic, seedless):
  - documents: replicated 10x with shifted doc_ids; replicas k>0 get a
    ~10%-of-tokens perturbation (token -> token+str(k) where
    (doc_id*31 + i) % 10 == 0) so replicas are NEAR-dups, not exact
    dups — dedup paths see realistic cluster growth (clusters ~10).
  - embeddings: replicated 10x with shifted vec_ids and a +k*1e-4
    per-replica perturbation.
  - relational tables: copied unchanged (the probe targets the
    documents/embeddings pole queries).

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1]
"""
import shutil, sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1")
    dst.mkdir(parents=True, exist_ok=True)

    for t in "region nation customer supplier part orders lineitem events".split():
        p = Path(src) / f"{t}.parquet"
        if p.exists():
            shutil.copy(p, dst / f"{t}.parquet")

    con = duckdb.connect()

    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{src}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    n = max(r[0] for r in docs) + 1
    out = []
    for k in range(10):
        for doc_id, text, lang, source, n_chars in docs:
            if k == 0:
                new_text = text
            else:
                toks = text.split(" ")
                toks = [t + str(k) if (doc_id * 31 + i) % 10 == 0 else t
                        for i, t in enumerate(toks)]
                new_text = " ".join(toks)
            out.append((doc_id + k * n, new_text, lang, source, len(new_text)))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in out], pa.int64()),
        "text": pa.array([r[1] for r in out], pa.string()),
        "lang": pa.array([r[2] for r in out], pa.string()),
        "source": pa.array([r[3] for r in out], pa.string()),
        "n_chars": pa.array([r[4] for r in out], pa.int64()),
    })
    pq.write_table(tbl, dst / "documents.parquet")

    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM read_parquet('{src}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    m = max(r[0] for r in emb) + 1
    vids, vecs, labels = [], [], []
    for k in range(10):
        for vec_id, e, label in emb:
            vids.append(vec_id + k * m)
            vecs.append([x + k * 1e-4 for x in e])
            labels.append(label)
    tbl = pa.table({
        "vec_id": pa.array(vids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, dst / "embeddings.parquet")
    print(f"SF1_DONE {dst}: {len(out)} docs, {len(vids)} vectors")


if __name__ == "__main__":
    main()
