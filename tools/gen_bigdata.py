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

    write("documents", f"""
        SELECT * FROM read_parquet('{BASE}/documents.parquet')
        UNION ALL BY NAME
        SELECT * EXCLUDE (k) REPLACE (doc_id + k*10000000 AS doc_id,
                          'rep' || k || ' ' || text AS text,
                          length('rep' || k || ' ' || text) AS n_chars)
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
