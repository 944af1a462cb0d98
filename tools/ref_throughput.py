import json, logging, random, sys, time, types
sys.path.insert(0, "/tmp/refstubs"); sys.path.insert(0, "/root/reference")
utils = types.ModuleType("knowledge_graph.utils")
utils.get_logger = lambda *a, **k: logging.getLogger("stub")
def iterate_batch(data, batch_size):
    items = list(data)
    for i in range(0, len(items), batch_size):
        yield items[i:i+batch_size]
utils.iterate_batch = iterate_batch
sys.modules["knowledge_graph.utils"] = utils
version = types.ModuleType("knowledge_graph.version"); version.Version = str
sys.modules["knowledge_graph.version"] = version
cloud = types.ModuleType("knowledge_graph.cloud"); cloud.AwsEnv = str; cloud.ComputeEnvironment = dict
sys.modules["knowledge_graph.cloud"] = cloud
from knowledge_graph.classifier.keyword import KeywordClassifier
from knowledge_graph.concept import Concept

# the same 13 demo concepts as graft.kg.DemoConceptStore
concepts = [
    ("Q10", "table scan", ["scan", "full-table scan"], []),
    ("Q11", "hash join", ["join"], []),
    ("Q12", "merge", ["sort-merge", "merge join"], []),
    ("Q13", "sort", [], ["sort table"]),
    ("Q14", "window", ["window function"], []),
    ("Q15", "spark", ["Spark SQL Engine"], []),
    ("Q16", "stream", ["data stream", "streaming"], []),
    ("Q17", "vector", [], []),
    ("Q18", "aggregation", ["agg", "group"], []),
    ("Q50", "relational operator", [], []),
    ("Q60", "runtime", [], []),
    ("Q70", "customer data", ["customer"], []),
    ("Q80", "row storage", ["row"], []),
]
clfs = [KeywordClassifier(Concept(wikibase_id=q, preferred_label=p,
                                  alternative_labels=a, negative_labels=n))
        for q, p, a, n in concepts]

# same text shape as Transcripts.synthesize: 24 tokens, 15% concept words
rng = random.Random(42)
concept_words = "the fast key order sort table scan merge part window small hash join batch stream spark group query row data slow filter customer line value agg column big a vector".split()
vocab = concept_words + [f"w{i}x" for i in range(170)]
texts = [" ".join(rng.choice(vocab) for _ in range(24)) for _ in range(20000)]

# warm-up
for clf in clfs:
    clf.predict(texts[:500], batch_size=32)

t0 = time.perf_counter()
n_spans = 0
for clf in clfs:  # reference runs one classifier pass per concept (J1 fan-out)
    for spans in clf.predict(texts, batch_size=32):
        n_spans += len(spans)
dt = time.perf_counter() - t0
print(json.dumps({
    "texts": len(texts), "concepts": len(clfs), "spans": n_spans,
    "seconds": round(dt, 3),
    "turns_per_sec_single_core": round(len(texts) / dt, 1),
    "concept_passes_per_sec": round(len(texts) * len(clfs) / dt, 1),
}))
