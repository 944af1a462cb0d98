import json, logging, sys, types, random
from difflib import SequenceMatcher
sys.path.insert(0, "/tmp/refstubs"); sys.path.insert(0, "/root/reference")
utils = types.ModuleType("knowledge_graph.utils")
utils.get_logger = lambda *a, **k: logging.getLogger("stub")
utils.iterate_batch = lambda d, b: (list(d)[i:i+b] for i in range(0, len(list(d)), b))
sys.modules["knowledge_graph.utils"] = utils
from knowledge_graph.span import Span, find_span_text_in_input_text

rng = random.Random(7)

# ratio vectors incl. >=200-char autojunk territory
ratio_cases = []
words = "the quick brown fox jumps over lazy dog climate policy green gas".split()
for n in (3, 8, 30, 60):
    a = " ".join(rng.choice(words) for _ in range(n))
    b = " ".join(rng.choice(words) for _ in range(n))
    ratio_cases.append({"a": a, "b": b, "ratio": SequenceMatcher(None, a, b).ratio()})
    c = a[: len(a)//2] + "X" + a[len(a)//2:]
    ratio_cases.append({"a": a, "b": c, "ratio": SequenceMatcher(None, a, c).ratio()})
ratio_cases.append({"a": "", "b": "", "ratio": 1.0})
ratio_cases.append({"a": "abc", "b": "", "ratio": 0.0})
# autojunk popular-crossing extension cases (>=200-char b, popular chars
# adjacent to indexed chars — difflib extends matches across them)
rng2 = random.Random(31337)
pop_alpha = ",;.xz abce"
for _ in range(20):
    a = "".join(rng2.choice(pop_alpha) for _ in range(rng2.randint(8, 40)))
    b = "".join(rng2.choice(pop_alpha) for _ in range(rng2.randint(200, 300)))
    ratio_cases.append({"a": a, "b": b, "ratio": SequenceMatcher(None, a, b).ratio()})
ratio_cases.append({"a": ",zz,,xz,c;e,  ,bz,a.zzc;;za,;z;",
                    "b": ("z," * 90) + ",xz,c;e,bz" + ("a;" * 5),
                    "ratio": SequenceMatcher(None, ",zz,,xz,c;e,  ,bz,a.zzc;;za,;z;", ("z," * 90) + ",xz,c;e,bz" + ("a;" * 5)).ratio()})
long_b = ("z" * 150) + "needle in haystack " + ("q" * 80)
ratio_cases.append({"a": "needle in haystack", "b": long_b,
                    "ratio": SequenceMatcher(None, "needle in haystack", long_b).ratio()})

xml_cases = []
def xml_case(xml, input_text=None, concept_id="Q42", valid=True):
    rec = {"xml": xml, "input_text": input_text, "concept_id": concept_id, "valid": valid}
    if valid:
        try:
            spans = Span.from_xml(xml=xml, concept_id=concept_id, labellers=["llm"], input_text=input_text)
            rec["expected"] = [[s.start_index, s.end_index, s.text] for s in spans]
        except Exception:
            # the reference raises (pydantic span validation) — record that
            # as the expected behavior class
            rec["raises"] = True
    xml_cases.append(rec)

xml_case("no tags at all")
xml_case("a <concept>gas tax</concept> was passed")
xml_case("<concept>flood</concept> and <concept>drought</concept> risks")
xml_case("ends with <concept>storm</concept>")
# mutated input: LLM dropped a word and changed whitespace
xml_case("a <concept>gas tax</concept> was passed quickly",
         input_text="a gas tax was passed very quickly")
xml_case("the <concept>climate  adaptation</concept> plan",
         input_text="the climate adaptation plan of 2030")
# unalignable span
xml_case("<concept>totally unrelated</concept> text",
         input_text="nothing matches here at all in any way")
# newline inside a concept group: the reference regex has no DOTALL, so
# the pair does NOT match (and tag-stripping still removes both tags)
xml_case("a <concept>gas\ntax</concept> ok <concept>flood</concept> x")
xml_case("pre <concept>one</concept> mid <concept>two\nlines</concept> post")
# invalid formats
xml_case("</concept>backwards<concept>", valid=False)
xml_case("<concept>nested <concept>tags</concept></concept>", valid=False)

fuzzy_cases = []
for (inp, span, start) in [
    ("a gas tax was passed very quickly", "gas tax", 2),
    ("a gas tax was passed very quickly", "gas  tax ", 2),
    ("the climate adaptation plan of 2030", "climate adaptation", 4),
    ("the climate adaption plan", "climate adaptation", 4),
    ("nothing here", "absent phrase", 0),
    ("offset off by some distance gas tax end", "gas tax", 5),
    # python-slice clamping: out-of-range offsets, empty span text
    ("short text", "", -1),
    ("short text", "", 9999),
    ("short text", "text", 9999),
    ("abcdef", "cde", -3),
]:
    got = find_span_text_in_input_text(input_text=inp, span_text=span, span_start_index=start)
    fuzzy_cases.append({"input": inp, "span": span, "start": start,
                        "found": list(got) if got else None})

json.dump({"ratio": ratio_cases, "xml": xml_cases, "fuzzy": fuzzy_cases},
          open("/root/repo/src/test/resources/xml_vectors.json", "w"), indent=1, ensure_ascii=False)
print("ok", len(ratio_cases), len(xml_cases), len(fuzzy_cases))
