#!/usr/bin/env python3
"""Dev-only: independent python implementation of the content-defined
chunker (Karp-Rabin rolling hash, graft.core.RollingChunker semantics with
64-bit wrap-around arithmetic) producing:

 1. src/test/resources/cdc_vectors.json — adversarial spec vectors
    (short/empty/boundary-heavy strings) for CdcSpec.
 2. src/test/resources/ref_cdc_chunks.parquet — expected chunks for every
    distinct corpus text across all sf dirs, keyed by md5(text), so the
    text_cdc driver query gets a plain-join DuckDB oracle.
"""
import hashlib
import json
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

BASE = 153191
W = 32
MASK = (1 << 6) - 1
MIN_LEN = 16
MAX_LEN = 256
M64 = (1 << 64) - 1


def boundaries(data: bytes):
    bw = 1
    for _ in range(W):
        bw = (bw * BASE) & M64
    out = []
    h = 0
    chunk_start = 0
    for i, b in enumerate(data):
        h = (h * BASE + b) & M64
        if i - chunk_start >= W:
            h = (h - data[i - W] * bw) & M64
        ln = i - chunk_start + 1
        if ln >= MAX_LEN or (ln >= MIN_LEN and (h & MASK) == 0):
            out.append(i + 1)
            chunk_start = i + 1
            h = 0
    if chunk_start < len(data):
        out.append(len(data))
    return out


def chunks(text: str):
    data = text.encode("utf-8")
    res, start = [], 0
    for idx, end in enumerate(boundaries(data)):
        res.append((idx, start, end, hashlib.md5(data[start:end]).hexdigest()))
        start = end
    return res


def main():
    # 1. spec vectors
    cases = ["", "a", "x" * 15, "y" * 16, "z" * 256, "w" * 1000,
             "the quick brown fox jumps over the lazy dog " * 20,
             "aaaa bbbb cccc dddd " * 40, "héllo wörld ünïcode " * 30]
    import random
    rng = random.Random(7)
    for _ in range(40):
        n = rng.randint(0, 600)
        cases.append("".join(rng.choice("abcdefgh ., \n") for _ in range(n)))
    vectors = [{"text": t, "chunks": [list(c) for c in chunks(t)]} for t in cases]
    Path("/root/repo/src/test/resources/cdc_vectors.json").write_text(
        json.dumps(vectors, indent=1, ensure_ascii=False))

    # 2. corpus fixture keyed by md5(text)
    con = duckdb.connect()
    import os
    dirs = [f"/root/testdata/{d}" for d in ["sf0.001", "sf0.01", "sf0.1"]]
    if os.path.isdir("/root/repo/bigdata"):  # sf1-equivalent sweep corpus
        dirs.append("/root/repo/bigdata")
    parts = " UNION ".join(
        f"SELECT DISTINCT text FROM read_parquet('{d}/documents.parquet')"
        for d in dirs)
    texts = sorted(r[0] for r in con.execute(parts).fetchall())
    rows = {"text_md5": [], "chunk_idx": [], "start": [], "end": [], "chunk_md5": []}
    n = 0
    for t in texts:
        md = hashlib.md5(t.encode("utf-8")).hexdigest()
        for idx, start, end, h in chunks(t):
            rows["text_md5"].append(md)
            rows["chunk_idx"].append(idx)
            rows["start"].append(start)
            rows["end"].append(end)
            rows["chunk_md5"].append(h)
            n += 1
    pq.write_table(pa.table({
        "text_md5": pa.array(rows["text_md5"], pa.string()),
        "chunk_idx": pa.array(rows["chunk_idx"], pa.int32()),
        "start": pa.array(rows["start"], pa.int32()),
        "end": pa.array(rows["end"], pa.int32()),
        "chunk_md5": pa.array(rows["chunk_md5"], pa.string()),
    }), "/root/repo/src/test/resources/ref_cdc_chunks.parquet")
    print(f"wrote {len(vectors)} spec vectors; {n} chunks for {len(texts)} texts")


if __name__ == "__main__":
    main()
