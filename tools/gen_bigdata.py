#!/usr/bin/env python3
"""Dev-only: synthesize the sf1-equivalent sweep corpus (10x sf0.1) at
/root/repo/bigdata (gitignored), deterministically derived from sf0.1 —
no external data, reproducible bit-for-bit.

Replica k in 1..9 re-keys and PERTURBS each base row so every derived text /
vector is genuinely distinct (no accidental planted duplicates):

  documents:  doc_id + k*10^7, text = "rep{k} " + text (new distinct text,
              all char offsets shift — span fixtures are REGENERATED over the
              union corpus), n_chars recomputed
  embeddings: vec_id + k*10^7, embedding rotated by k dims (norm-preserving,
              decorrelates from the base vector)
  events:     event_id + k*10^8, user_id + k*10^5
  lineitem:   l_orderkey + k*10^8
  orders:     o_orderkey + k*10^8
  customer/part/supplier/nation/region: copied as-is (dimensions)

Usage: python3 tools/gen_bigdata.py [replicas=9] [outdir=/root/repo/bigdata]
"""
import sys

import duckdb

BASE = "/root/testdata/sf0.1"
REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 9
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bigdata"


def main():
    import pathlib
    pathlib.Path(OUT).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    ks = ", ".join(str(k) for k in range(1, REPL + 1))

    def write(name, sql):
        con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows")

    # replica text = "rep{k} " + k-dependent STRIDE PERMUTATION of the base
    # tokens. A plain prefix kept replicas near-duplicates of their base
    # (one changed shingle out of ~55) — at 10 replicas every shingle's
    # document frequency went 10x, and the exact all-pairs dedup oracles
    # (shingle-equijoin candidates) went QUADRATIC in that frequency: the
    # first sweep attempt spilled >61 GB in DuckDB. The stride reorder
    # destroys token adjacency (distinct stride per k), so replicas share
    # almost no shingles with their base or each other — the organic shape
    # of a real 10x corpus — while keeping the token MULTISET (BoW models,
    # quality stats, langid are text-set-level unchanged).
    strides = {1: 3, 2: 5, 3: 7, 4: 11, 5: 13, 6: 17, 7: 19, 8: 23, 9: 29}
    stride_case = "CASE k " + " ".join(f"WHEN {k} THEN {s}" for k, s in strides.items()) + " END"
    write("documents", f"""
        SELECT * FROM read_parquet('{BASE}/documents.parquet')
        UNION ALL BY NAME
        SELECT * EXCLUDE (k) REPLACE (doc_id + k*10000000 AS doc_id,
                          'rep' || k || ' ' || array_to_string(
                              list_transform(range(len(string_split(text, ' '))),
                                  i -> string_split(text, ' ')[((i * ({stride_case}) + k)
                                       % len(string_split(text, ' '))) + 1]), ' ') AS text,
                          length('rep' || k || ' ' || array_to_string(
                              list_transform(range(len(string_split(text, ' '))),
                                  i -> string_split(text, ' ')[((i * ({stride_case}) + k)
                                       % len(string_split(text, ' '))) + 1]), ' ')) AS n_chars)
        FROM read_parquet('{BASE}/documents.parquet'), unnest([{ks}]) AS t(k)""")

    write("embeddings", f"""
        SELECT * FROM read_parquet('{BASE}/embeddings.parquet')
        UNION ALL BY NAME
        SELECT * EXCLUDE (k) REPLACE (vec_id + k*10000000 AS vec_id,
               list_transform(range(len(embedding)),
                              i -> embedding[((i + k) % len(embedding)) + 1]) AS embedding)
        FROM read_parquet('{BASE}/embeddings.parquet'), unnest([{ks}]) AS t(k)""")

    write("events", f"""
        SELECT * FROM read_parquet('{BASE}/events.parquet')
        UNION ALL BY NAME
        SELECT * EXCLUDE (k) REPLACE (event_id + k*100000000 AS event_id,
                          user_id + k*100000 AS user_id)
        FROM read_parquet('{BASE}/events.parquet'), unnest([{ks}]) AS t(k)""")

    write("lineitem", f"""
        SELECT * FROM read_parquet('{BASE}/lineitem.parquet')
        UNION ALL BY NAME
        SELECT * EXCLUDE (k) REPLACE (l_orderkey + k*100000000 AS l_orderkey)
        FROM read_parquet('{BASE}/lineitem.parquet'), unnest([{ks}]) AS t(k)""")

    write("orders", f"""
        SELECT * FROM read_parquet('{BASE}/orders.parquet')
        UNION ALL BY NAME
        SELECT * EXCLUDE (k) REPLACE (o_orderkey + k*100000000 AS o_orderkey)
        FROM read_parquet('{BASE}/orders.parquet'), unnest([{ks}]) AS t(k)""")

    for dim in ["customer", "part", "supplier", "nation", "region"]:
        write(dim, f"SELECT * FROM read_parquet('{BASE}/{dim}.parquet')")


if __name__ == "__main__":
    main()
