"""Random-concept fuzz corpus, hypothesis-strategy-shaped (mirrors
tests/common_strategies.py): random single/multi-word labels over a wide
alphabet (incl. unicode letters), separator-variant embeddings, token-
disjoint negative labels. Expected spans from the REAL reference classifier."""
import json, random, sys
sys.argv = [sys.argv[0], "/tmp/fuzz_cases.json"]  # input for ref_oracle pattern

rng = random.Random(20260816)

ALPHA = "abcdefghijklmnopqrstuvwxyz"
UNI = "éüßñøåçΔλ語ж" + chr(0x212A) + chr(0x17F)  # + kelvin sign, long s
SEPS = [" ", "-", "–", "—", "\n", "\t"]
NOISE_WORDS = ["lorem", "ipsum", "POLICY", "Climate", "x9", "_v", "naïve",
               "end.", "(a)", "b,c", "«d»", "CO₂e", "ΔT", "中文", "the", "of",
               chr(0x1D400) + "bold", chr(0x1F642), chr(0x1D7D8) + "x",
               "pre" + chr(0x1F680), chr(0x1C) + "fs", "a" + chr(0x1C) + "b"]

def word(maxlen=8, unicode_p=0.15, upper_p=0.15):
    n = rng.randint(1, maxlen)
    chars = []
    for _ in range(n):
        if rng.random() < unicode_p:
            chars.append(rng.choice(UNI))
        else:
            c = rng.choice(ALPHA)
            if rng.random() < upper_p:
                c = c.upper()
            chars.append(c)
    return "".join(chars)

def label(max_words=3, **kw):
    return " ".join(word(**kw) for _ in range(rng.randint(1, max_words)))

def variant(lab):
    out = lab
    for _ in range(2):
        if " " in out and rng.random() < 0.7:
            parts = out.split(" ")
            i = rng.randint(0, len(parts) - 2)
            out = " ".join(parts[:i]) + (" " if i else "") + parts[i] + rng.choice(SEPS) + " ".join(parts[i+1:])
    if rng.random() < 0.3:
        out = out.upper() if rng.random() < 0.5 else out.lower()
    return out

def text_with(labels):
    toks = []
    for _ in range(rng.randint(0, 8)):
        toks.append(rng.choice(NOISE_WORDS))
    for lab in labels:
        pos = rng.randint(0, len(toks))
        toks.insert(pos, variant(lab))
    glue = rng.choice([" ", "  ", " , ", ". "])
    return glue.join(toks)

cases = []
for i in range(60):
    pos = [label() for _ in range(rng.randint(1, 4))]
    # token-disjoint negatives: positive label + extra word
    negs = []
    if rng.random() < 0.4:
        negs = [rng.choice(pos) + " " + word(unicode_p=0, upper_p=0)]
    texts = []
    for _ in range(8):
        k = rng.randint(0, 2)
        labs = [rng.choice(pos + negs) for _ in range(k)]
        texts.append(text_with(labs))
    texts.append("")  # empty text
    texts.append(rng.choice(pos))  # exact label alone
    try:
        cases.append({
            "wikibase_id": f"Q{1000 + i}",
            "preferred_label": pos[0],
            "alternative_labels": sorted(set(pos[1:])),
            "negative_labels": negs,
            "texts": texts,
        })
    except Exception:
        pass
json.dump(cases, open("/tmp/fuzz_cases.json", "w"), ensure_ascii=False)
print(len(cases), "cases")
