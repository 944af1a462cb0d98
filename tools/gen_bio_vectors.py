#!/usr/bin/env python3
"""Differential vectors for BIO span reconstruction: executes the REFERENCE
`_reconstruct_spans_from_predictions` (bert_token_classifier.py:119-193) on
randomized BIO sequences and dumps (inputs, expected spans) as JSON for the
Scala BioSpansSpec. The transformer/torch imports are stubbed as empty
modules — the reconstruction function itself touches only numpy, datetime
and Span, and runs unmodified.
"""
import json
import logging
import random
import sys
import types

sys.path.insert(0, "/tmp/refstubs")
sys.path.insert(0, "/root/reference")

# same knowledge_graph stubs as ref_oracle.py
utils = types.ModuleType("knowledge_graph.utils")
utils.get_logger = lambda *a, **k: logging.getLogger("stub")
utils.iterate_batch = lambda d, b: (list(d)[i:i + b] for i in range(0, len(list(d)), b))
sys.modules["knowledge_graph.utils"] = utils
version = types.ModuleType("knowledge_graph.version")
version.Version = type("Version", (str,), {})
sys.modules["knowledge_graph.version"] = version
cloud = types.ModuleType("knowledge_graph.cloud")
cloud.AwsEnv = type("AwsEnv", (str,), {})
cloud.ComputeEnvironment = dict
sys.modules["knowledge_graph.cloud"] = cloud

# stub the model-runtime imports the reconstruction function never touches
def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m

class _Any:
    def __init__(self, *a, **k):
        pass
    def __call__(self, *a, **k):
        return self
    def __getattr__(self, _):
        return _Any()

_stub("torch", device=_Any, no_grad=_Any, softmax=_Any, argmax=_Any,
      manual_seed=_Any, arange=_Any, cuda=_Any(), backends=_Any(), mps=_Any())
_stub("datasets", Dataset=_Any)
_stub("seqeval")
_stub("seqeval.metrics", accuracy_score=_Any(), classification_report=_Any(),
      f1_score=_Any(), precision_score=_Any(), recall_score=_Any())
_stub("sklearn")
_stub("sklearn.model_selection", train_test_split=_Any())
_stub("sklearn.utils")
_stub("sklearn.utils.class_weight", compute_class_weight=_Any())
tr = _stub("transformers", AutoModelForTokenClassification=_Any(),
           AutoTokenizer=_Any(), EvalPrediction=_Any, PreTrainedModel=_Any,
           PreTrainedTokenizer=_Any, EarlyStoppingCallback=_Any)
_stub("transformers.data")
_stub("transformers.data.data_collator", DataCollatorForTokenClassification=_Any)
_stub("transformers.trainer", Trainer=_Any)
_stub("transformers.training_args", TrainingArguments=_Any)

from knowledge_graph.classifier.bert_token_classifier import (  # noqa: E402
    _reconstruct_spans_from_predictions,
    O_LABEL, B_LABEL, I_LABEL,
)

def main():
    rng = random.Random(1234)
    cases = []
    # hand-picked edge cases: orphaned I, adjacent B-B, span at sequence end,
    # sub-min-span-chars, special-token skipping mid-sequence
    hand = [
        # (labels, offsets described as word starts) built below
        [O_LABEL, B_LABEL, I_LABEL, I_LABEL, O_LABEL],
        [O_LABEL, I_LABEL, I_LABEL, O_LABEL],          # orphaned I run
        [B_LABEL, B_LABEL, I_LABEL],                   # B finalises open B
        [O_LABEL, O_LABEL, B_LABEL],                   # span open at end
        [B_LABEL],                                     # single short token
        [B_LABEL, O_LABEL, B_LABEL, I_LABEL, B_LABEL], # interleaved
    ]
    def offsets_for(n, rng):
        # word-shaped offsets: token i covers [start, start+len); some gaps
        offs, pos = [], 0
        for _ in range(n):
            ln = rng.randint(1, 8)
            offs.append((pos, pos + ln))
            pos += ln + rng.randint(1, 2)
        return offs, pos

    for labels in hand:
        offs, textlen = offsets_for(len(labels), rng)
        probs = [round(rng.random(), 6) for _ in labels]
        cases.append((labels, probs, offs, textlen))

    for _ in range(60):
        n = rng.randint(1, 25)
        labels = [rng.choice([O_LABEL, O_LABEL, B_LABEL, I_LABEL]) for _ in range(n)]
        offs, textlen = offsets_for(n, rng)
        # sprinkle special tokens (0,0) with arbitrary labels — must be skipped
        for i in range(n):
            if rng.random() < 0.15:
                offs[i] = (0, 0)
                labels[i] = rng.choice([O_LABEL, B_LABEL, I_LABEL])
        probs = [round(rng.random(), 6) for _ in range(n)]
        cases.append((labels, probs, offs, textlen))

    out = []
    for labels, probs, offs, textlen in cases:
        text = "x" * textlen
        spans = _reconstruct_spans_from_predictions(
            token_labels=labels,
            token_probs=probs,
            offset_mapping=offs,
            text=text,
            concept_id=None,
            labeller="stub",
        )
        out.append({
            "labels": labels,
            "probs": probs,
            "offsets": [[a, b] for a, b in offs],
            "expected": [
                {"start": s.start_index, "end": s.end_index,
                 "probability": s.prediction_probability}
                for s in spans
            ],
        })
    path = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/bio_vectors.json"
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {len(out)} cases to {path}")

if __name__ == "__main__":
    main()
