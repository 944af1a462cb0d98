#!/usr/bin/env python3
"""Generate differential test vectors for the keyword matcher (dev-only)."""
import json
import random
import sys

rng = random.Random(42)

NOISE = ["the", "of", "and", "policy", "Climate", "CHANGE", "naïve", "coöp",
         "x1", "_u", "end.", "«quoted»", "emissions,", "(risk)", "CO₂",
         "ångström", "ß", "ΔT", "日本語", "tok"]
SEPS = [" ", "-", "–", "—", "\n", "\t", " - ", "  ", " "]

def noisy(k):
    return " ".join(rng.choice(NOISE) for _ in range(k))

def embed(label, sep_variant=None):
    l = label
    if sep_variant is not None and " " in label:
        l = label.replace(" ", sep_variant)
    left, right = noisy(rng.randint(0, 6)), noisy(rng.randint(0, 6))
    glue_l = rng.choice(["", " ", ", ", "-", "("])
    glue_r = rng.choice(["", " ", ", ", ")", "-", ".", "s "])
    return f"{left}{' ' if left else ''}{glue_l}{l}{glue_r}{right}"

cases = []

def case(preferred, alts=[], negs=[], texts=None, wikibase_id="Q123"):
    if texts is None:
        texts = []
        labels = [preferred] + alts
        for lab in labels:
            texts.append(embed(lab))
            for sep in SEPS:
                texts.append(embed(lab, sep))
        for neg in negs:
            texts.append(embed(neg))
            texts.append(embed(neg, "-"))
        texts.append(noisy(8))
        texts.append(" ".join([preferred] * 3))
        texts.append(f"xyz{preferred}abc")
        texts.append(preferred.upper() + " " + preferred.lower() + " " + preferred.title())
    cases.append({
        "wikibase_id": wikibase_id,
        "preferred_label": preferred,
        "alternative_labels": alts,
        "negative_labels": negs,
        "texts": texts,
    })

case("greenhouse gas", ["gas"], ["greenhouse gas emissions"])
case("WHO", [], [], texts=[
    "The WHO released guidance.", "the who released guidance.",
    "WHO-led effort", "xyzWHOabc", "WHO", "W.H.O. and WHO?",
])
case("who")
case("gas", [], ["greenhouse gas"], texts=[
    "gas, prices rose", "(gas) is discussed", "greenhouse-gas emissions",
    "greenhouse gas and gas", "gas gas greenhouse gas gas",
    "greenhouse\ngas costs gas",
])
case("CO₂", ["carbon dioxide"], texts=None)
case("Météo", [], [], texts=["Météo report", "(Météo) today", "Météo\nreport", "la météo est belle"])
case("sort", [], ["sort table"], texts=[
    "sort table sort", "sort sort table", "please sort the table",
    "sort-table and sort", "sort—table", "table sort table sort table",
])
case("extreme weather", ["weather", "extreme weather event"], texts=[
    "extreme weather event struck", "the weather was extreme weather",
    "extreme-weather-event", "an extreme weather warning",
    "extreme  weather", "EXTREME WEATHER",
])
case("climate change adaptation", ["adaptation", "climate adaptation"])
case("a", ["b-c"], texts=["a b-c a", "a-b c", "b c", "b—c", "ab-c", "b-ca"])
case("farmers' rights", ["right to food"], texts=[
    "farmers' rights matter", "the farmers' rights, and the right to food",
    "right-to-food policy", "farmers rights",
])
case("net-zero", ["net zero target"], texts=None)
case("ÅNGSTRÖM", [], [], texts=["ÅNGSTRÖM scale", "ångström scale", "Ångström scale"])
case("naïve bayes", [], [], texts=["a naïve bayes model", "NAÏVE BAYES", "naïve-bayes"])

# adversarial overlap case: alternation priority among same-length labels
case("abc def", ["abc", "def", "bc de"], texts=[
    "abc def ghi", "x abc de f", "abc bc de f", "zz bc de yy abc def",
])
# label that is a prefix of another token
case("cat", ["cat flap"], texts=["cat flap catflap cat-flap", "the cat, a catflap"])

# unicode edge semantics: Kelvin sign / long s casefold to ascii under
# IGNORECASE; supplementary-plane word chars are word boundaries; control
# chars U+001C-1F are neither \w nor \s
case("kelvin", texts=["the \u212aELVIN scale", "kelvin and KELVIN", "\u212aelvin x"])
case("gas", texts=["\U0001D400gas", "emoji \U0001F642gas after", "gas\U0001D400 x",
                   "a gas b", "gas\u001cx", "a\u001cgas"])
case("si unit", texts=["\u017fi unit test", "SI UNIT", "si\u001cunit", "si unit"])
case("greenhouse gas", texts=["greenhouse\u001cgas", "greenhouse\u000bgas", "greenhouse\u1680gas"])
json.dump(cases, open(sys.argv[1], "w"), indent=1, ensure_ascii=False)
print(f"{len(cases)} cases, {sum(len(c['texts']) for c in cases)} texts")
