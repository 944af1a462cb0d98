#!/usr/bin/env python3
"""Dev-only: differential vectors + oracle fixture for the geography fuzzy
match (reference: knowledge_graph/geography.py:22-33, rapidfuzz fuzz.ratio).

rapidfuzz is not installed here, so this implements the documented semantics
independently — normalized InDel similarity via an LCS DP over codepoints,
ratio = 200*LCS/(la+lb), case-sensitive, 100.0 for two empty strings — which
is a genuinely different code path from the Scala implementation.

Outputs:
 1. src/test/resources/geo_vectors.json — (query, expected_iso, expected_best
    ratio) cases for GeographySpec.
 2. src/test/resources/ref_geo_links.parquet — (geo_string, iso) for every
    distinct synthetic geography string the kg_geography driver query
    derives from doc_ids, so the DuckDB oracle is a plain join.
"""
import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

DIM = json.load(open("/root/repo/src/main/resources/graft/geography_dim.json"))


def lcs(x, y):
    dp = [0] * (len(y) + 1)
    for i in range(len(x)):
        prev = 0
        for j in range(len(y)):
            tmp = dp[j + 1]
            dp[j + 1] = prev + 1 if x[i] == y[j] else max(dp[j + 1], dp[j])
            prev = tmp
    return dp[len(y)]


def ratio(a, b):
    if not a and not b:
        return 100.0
    if not a or not b:
        return 0.0
    return 200.0 * lcs(a, b) / (len(a) + len(b))


def best_iso(s):
    best_score, best = 0.0, ""
    for row in DIM:
        sc = ratio(s, row["name"])
        if sc > best_score:
            best_score, best = sc, row["iso"]
    return best, best_score


def geo_string(doc_id):
    """Mirror of the kg_geography string derivation (SparkEntry/OracleGen)."""
    nm = DIM[doc_id % len(DIM)]["name"]
    p = doc_id % 5 + 2
    if doc_id % 3 == 0:
        return nm[: p - 1] + nm[p:]
    return nm


def main():
    # 1. spec vectors: exact names, single-char drops, swaps, case damage,
    #    unicode, empties, garbage
    cases = []
    for row in DIM:
        cases.append(row["name"])
    for row in DIM[::5]:
        n = row["name"]
        cases += [n[1:], n[:-1], n[: len(n) // 2] + n[len(n) // 2 + 1 :], n.lower(), n.upper(), n + "n"]
    cases += ["", "zzzz", "Untied States", "germny", "Cote d'Ivoire", "côte d'ivoire",
              "South", "United", "New Zeland", "Viet nam", "KOREA", "  Spain  "]
    out = []
    for q in cases:
        iso, sc = best_iso(q)
        out.append({"query": q, "expected_iso": iso, "expected_score": sc})
    Path("/root/repo/src/test/resources/geo_vectors.json").write_text(
        json.dumps(out, indent=1, ensure_ascii=False))

    # 2. oracle fixture over every doc_id any sf can produce (sf0.1 max 5000
    #    docs; 2e6 covers planted-dup rekeys and future sfs cheaply)
    strings = sorted({geo_string(d) for d in range(2_000_000)} )
    isos = [best_iso(s)[0] for s in strings]
    pq.write_table(
        pa.table({"geo_string": pa.array(strings, pa.string()), "iso": pa.array(isos, pa.string())}),
        "/root/repo/src/test/resources/ref_geo_links.parquet")
    print(f"wrote {len(out)} spec vectors, {len(strings)} oracle strings")


if __name__ == "__main__":
    main()
