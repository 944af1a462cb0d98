#!/usr/bin/env python3
"""Dev-only: materialize EXECUTED-REFERENCE mention spans as a parquet oracle
fixture.

Runs the actual reference KeywordClassifier
(/root/reference/knowledge_graph/classifier/keyword.py) with the demo concept
store (src/test/resources/demo_concepts.json — parity-tested against the Scala
DemoConceptStore) over every distinct document text in
/root/testdata/sf{0.001,0.01,0.1}/documents.parquet, and writes one row per
expected span keyed by md5(text):

    (text_md5, concept_id, start, end, surface, span_id)

Mentions are a pure function of (text, concept store) — the reference Span id
is Identifier.generate(text, start, end, concept_id) — so the driver's DuckDB
oracle can join this fixture onto ANY turns table derived from the corpus,
at any scale factor, via md5(text). The whole corpus is ASCII, so Python
codepoint offsets == Java char offsets == DuckDB char offsets.
"""
import hashlib
import json
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
import ref_oracle  # noqa: F401  (installs the knowledge_graph import stubs)

from knowledge_graph.classifier.keyword import KeywordClassifier  # noqa: E402
from knowledge_graph.concept import Concept  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# the sf1-equivalent sweep corpus (tools/gen_bigdata.py), when generated
import os as _os
if _os.path.isdir("/root/repo/bigdata"):
    SF_DIRS = SF_DIRS + ["/root/repo/bigdata"]
CONCEPTS_JSON = "/root/repo/src/test/resources/demo_concepts.json"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/src/test/resources/ref_mentions.parquet"


def main():
    con = duckdb.connect()
    parts = " UNION ".join(
        f"SELECT DISTINCT text FROM read_parquet('{d}/documents.parquet') WHERE lang = 'en'"
        for d in SF_DIRS
    )
    texts = [r[0] for r in con.execute(parts).fetchall()]
    texts.sort()
    print(f"{len(texts)} distinct en texts")

    classifiers = []
    for c in json.load(open(CONCEPTS_JSON)):
        concept = Concept(
            wikibase_id=c["wikibase_id"],
            preferred_label=c["preferred_label"],
            alternative_labels=c.get("alternative_labels", []),
            negative_labels=c.get("negative_labels", []),
        )
        classifiers.append((c["wikibase_id"], KeywordClassifier(concept)))

    rows = {"text_md5": [], "concept_id": [], "start": [], "end": [], "surface": [], "span_id": []}
    n_spans = 0
    for text in texts:
        md = hashlib.md5(text.encode("utf-8")).hexdigest()
        for qid, clf in classifiers:
            for s in clf.predict(text):
                rows["text_md5"].append(md)
                rows["concept_id"].append(qid)
                rows["start"].append(s.start_index)
                rows["end"].append(s.end_index)
                rows["surface"].append(text[s.start_index:s.end_index])
                rows["span_id"].append(str(s.id))
                n_spans += 1

    table = pa.table({
        "text_md5": pa.array(rows["text_md5"], pa.string()),
        "concept_id": pa.array(rows["concept_id"], pa.string()),
        "start": pa.array(rows["start"], pa.int32()),
        "end": pa.array(rows["end"], pa.int32()),
        "surface": pa.array(rows["surface"], pa.string()),
        "span_id": pa.array(rows["span_id"], pa.string()),
    })
    pq.write_table(table, OUT)
    print(f"wrote {n_spans} spans for {len(texts)} texts -> {OUT}")


if __name__ == "__main__":
    main()
