#!/usr/bin/env python3
"""Dev-only differential oracle: runs the ACTUAL reference KeywordClassifier
(/root/reference) on test vectors and dumps expected spans as JSON, so the
Scala matcher can be differential-tested against the real Python semantics.

Stubs the unimportable bits (rich UI, the PEP-695 utils module) — the
classifier/span/concept code paths themselves run unmodified.
"""
import json
import logging
import sys
import types

sys.path.insert(0, "/tmp/refstubs")
sys.path.insert(0, "/root/reference")

# stub knowledge_graph.utils (PEP 695 syntax unparseable on py3.11)
utils = types.ModuleType("knowledge_graph.utils")
utils.get_logger = lambda *a, **k: logging.getLogger("stub")

def iterate_batch(data, batch_size):
    items = list(data)
    for i in range(0, len(items), batch_size):
        yield items[i:i + batch_size]

utils.iterate_batch = iterate_batch
sys.modules["knowledge_graph.utils"] = utils

# stub version/cloud (wandb-coupled / PEP-695 syntax) — not on the
# classifier/span/concept code paths we exercise
version = types.ModuleType("knowledge_graph.version")
class Version(str):
    pass
version.Version = Version
sys.modules["knowledge_graph.version"] = version

cloud = types.ModuleType("knowledge_graph.cloud")
class AwsEnv(str):
    pass
cloud.AwsEnv = AwsEnv
cloud.ComputeEnvironment = dict
sys.modules["knowledge_graph.cloud"] = cloud

from knowledge_graph.classifier.keyword import KeywordClassifier  # noqa: E402
from knowledge_graph.concept import Concept  # noqa: E402

def main():
    cases = json.load(open(sys.argv[1]))
    out = []
    for case in cases:
        concept = Concept(
            wikibase_id=case.get("wikibase_id", "Q123"),
            preferred_label=case["preferred_label"],
            alternative_labels=case.get("alternative_labels", []),
            negative_labels=case.get("negative_labels", []),
        )
        clf = KeywordClassifier(concept)
        expected = []
        for text in case["texts"]:
            spans = clf.predict(text)
            expected.append([
                {"start": s.start_index, "end": s.end_index, "id": str(s.id)}
                for s in spans
            ])
        out.append({**case, "expected": expected})
    json.dump(out, open(sys.argv[2], "w"), indent=1, ensure_ascii=False)
    print(f"wrote {len(out)} cases")

if __name__ == "__main__":
    main()
