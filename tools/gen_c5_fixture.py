#!/usr/bin/env python3
"""Dev-only: materialize EXECUTED-REFERENCE C5 LLM-span alignments as a
parquet oracle fixture.

Mirrors graft.extract.LlmSim.buildXml token-for-token (the deterministic
annotation simulator: trigger tokens wrapped in <concept> tags, 7-residue-3
wrapped tokens truncated by one char, 13-residue-5 unwrapped tokens dropped,
9-residue-4 tokens gaining a trailing space), then runs the REAL reference
`Span.from_xml(..., input_text=text)` (span.py:272-384 + the fuzzy window
search at span.py:489-553) over every distinct en document text of the three
sf dirs, writing one row per aligned span:

    (text_md5, start, end, surface)

Spans are a pure function of (text, builder), so the driver's DuckDB oracle
joins this fixture onto documents at any scale factor via md5(text).
"""
import hashlib
import logging
import sys
import types

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/tmp/refstubs")
sys.path.insert(0, "/root/reference")
utils = types.ModuleType("knowledge_graph.utils")
utils.get_logger = lambda *a, **k: logging.getLogger("stub")
utils.iterate_batch = lambda d, b: (list(d)[i:i + b] for i in range(0, len(list(d)), b))
sys.modules["knowledge_graph.utils"] = utils
from knowledge_graph.span import Span  # noqa: E402

TRIGGERS = {"scan", "join", "merge", "window", "sort"}
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# the sf1-equivalent sweep corpus (tools/gen_bigdata.py), when generated
import os as _os
if _os.path.isdir("/root/repo/bigdata"):
    SF_DIRS = SF_DIRS + ["/root/repo/bigdata"]
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/src/test/resources/ref_c5_spans.parquet"


def build_xml(text: str) -> str:
    toks = text.split(" ")
    out = []
    for i, tok in enumerate(toks):
        wrapped = tok.lower() in TRIGGERS
        if not wrapped and i % 13 == 5:
            continue  # dropped from the annotation
        t = tok[:-1] if (wrapped and i % 7 == 3 and len(tok) > 4) else tok
        piece = f"<concept>{t}</concept>" if wrapped else t
        out.append(piece + " " if i % 9 == 4 else piece)
    return " ".join(out)


def main():
    con = duckdb.connect()
    parts = " UNION ".join(
        f"SELECT DISTINCT text FROM read_parquet('{d}/documents.parquet') WHERE lang = 'en'"
        for d in SF_DIRS)
    texts = sorted(r[0] for r in con.execute(parts).fetchall())
    print(f"{len(texts)} distinct en texts")

    rows = {"text_md5": [], "start": [], "end": [], "surface": []}
    n_spans = 0
    n_texts_with = 0
    for t in texts:
        xml = build_xml(t)
        spans = Span.from_xml(xml=xml, concept_id="Q42", labellers=["llm"], input_text=t)
        if spans:
            n_texts_with += 1
        md5 = hashlib.md5(t.encode()).hexdigest()
        for s in spans:
            n_spans += 1
            rows["text_md5"].append(md5)
            rows["start"].append(s.start_index)
            rows["end"].append(s.end_index)
            rows["surface"].append(t[s.start_index:s.end_index])
    pq.write_table(pa.table(rows), OUT)
    print(f"{n_spans} aligned spans over {n_texts_with}/{len(texts)} texts -> {OUT}")


if __name__ == "__main__":
    main()
