#!/usr/bin/env python3
"""Dev-only: materialize /tmp/refstubs, the minimal import stubs that let the
differential-test harness EXECUTE /root/reference's classifier/span/concept
code on py3.11 without the reference's UI/cloud dependency stack.

Every tool that runs the reference (ref_oracle.py, ref_throughput.py,
gen_*_vectors.py, gen_ref_mentions.py, gen_c5_fixture.py) does
`sys.path.insert(0, "/tmp/refstubs")` before `/root/reference`; this script
is the single place that directory comes from. The stubs are inert
stand-ins for `rich` (terminal UI only — no behavior on the classifier code
paths we exercise); everything semantic (pydantic, the classifier/span/
concept modules themselves) runs unmodified from /root/reference.

Idempotent; run any time /tmp is cleaned:  python3 tools/make_refstubs.py
"""
import pathlib

ROOT = pathlib.Path("/tmp/refstubs")


def w(rel: str, body: str) -> None:
    p = ROOT / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(body)


def main() -> None:
    # rich: Console/Progress/Table/box are pure terminal presentation in the
    # reference (progress bars around batch loops, pretty tables in
    # operations/). The stubs accept anything and do nothing; Progress
    # supports the context-manager + track/add_task/update surface.
    w("rich/__init__.py", "box = None\n\ndef print(*a, **k):\n    pass\n")
    w("rich/console.py", (
        "class Console:\n"
        "    def __init__(self, *a, **k): pass\n"
        "    def print(self, *a, **k): pass\n"
        "    def log(self, *a, **k): pass\n"
        "    def status(self, *a, **k):\n"
        "        return _Null()\n"
        "\n"
        "class _Null:\n"
        "    def __enter__(self): return self\n"
        "    def __exit__(self, *a): return False\n"
    ))
    w("rich/progress.py", (
        "class _Col:\n"
        "    def __init__(self, *a, **k): pass\n"
        "\n"
        "BarColumn = MofNCompleteColumn = TextColumn = TimeRemainingColumn = "
        "TimeElapsedColumn = SpinnerColumn = _Col\n"
        "\n"
        "class Progress:\n"
        "    def __init__(self, *a, **k): pass\n"
        "    def __enter__(self): return self\n"
        "    def __exit__(self, *a): return False\n"
        "    def add_task(self, *a, **k): return 0\n"
        "    def update(self, *a, **k): pass\n"
        "    def advance(self, *a, **k): pass\n"
        "    def track(self, it, *a, **k):\n"
        "        return iter(it)\n"
        "\n"
        "def track(it, *a, **k):\n"
        "    return iter(it)\n"
    ))
    w("rich/table.py", (
        "class Table:\n"
        "    def __init__(self, *a, **k): pass\n"
        "    def add_column(self, *a, **k): pass\n"
        "    def add_row(self, *a, **k): pass\n"
    ))
    print(f"refstubs materialized at {ROOT}")


if __name__ == "__main__":
    main()
