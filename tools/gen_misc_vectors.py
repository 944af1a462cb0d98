import json, logging, sys, types
sys.path.insert(0, "/tmp/refstubs"); sys.path.insert(0, "/root/reference")
utils = types.ModuleType("knowledge_graph.utils")
utils.get_logger = lambda *a, **k: logging.getLogger("stub")
utils.iterate_batch = lambda d, b: (list(d)[i:i+b] for i in range(0, len(list(d)), b))
sys.modules["knowledge_graph.utils"] = utils
from knowledge_graph.labelled_passage import LabelledPassage
from knowledge_graph.identifiers import Identifier
from knowledge_graph.span import Span, jaccard_similarity, group_overlapping_spans, merge_overlapping_spans, jaccard_similarity_for_span_lists

texts = [
    "plain text", "a & b < c > d \"quoted\" 'single'",
    "smart “quotes” and ’apostrophe’ — em-dash … ellipsis",
    "nbsp here tab\there nl\nhere", "mixé ünïcode ß ΔT CO₂",
    "", "&&&<<<>>>",
]
sanitise = [{"in": t, "out": LabelledPassage.sanitise(t)} for t in texts]

idents = []
for args in [["some", "data"], ["text", 0, 5, "Q42"], ["a"], ["x", None],
             ["naïve ünïcode ΔT", 3, 17, "Q787"], [123, 45.0, True]]:
    idents.append({"args": [str(a) for a in args],
                   "joined": "".join(str(a) for a in args),
                   "id": str(Identifier.generate(*args))})

# span algebra vectors on one text
T = "the quick brown fox jumps over the lazy dog"
def sp(s, e, cid="Q1", lab=None):
    return Span(text=T, start_index=s, end_index=e, concept_id=cid, labellers=lab or ["L1"])
spans = [sp(0,9), sp(4,15), sp(10,19,"Q1",["L2"]), sp(20,25), sp(22,30), sp(31,34), sp(0,43)]
groups = group_overlapping_spans(spans)
merged = merge_overlapping_spans(spans)
alg = {
  "text": T,
  "spans": [[s.start_index, s.end_index] for s in spans],
  "jaccards": [[a.start_index,a.end_index,b.start_index,b.end_index, float(jaccard_similarity(a,b))]
               for a in spans for b in spans],
  "groups": [[[s.start_index, s.end_index] for s in g] for g in groups],
  "merged": [[s.start_index, s.end_index, s.labellers] for s in merged],
  "list_jaccard": float(jaccard_similarity_for_span_lists(spans[:3], spans[3:])),
}
json.dump({"sanitise": sanitise, "identifiers": idents, "span_algebra": alg},
          open("/root/repo/src/test/resources/misc_vectors.json", "w"), indent=1, ensure_ascii=False)
print("ok")
