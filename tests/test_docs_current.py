"""Docs-vs-bench freshness (VERDICT r3 #6): the AUTOGEN blocks in
docs/performance.md and README.md must match what scripts/perf_table.py
renders from the BENCH_r*.json files currently in the repo. When a new
bench round lands (the driver writes BENCH_rN.json at round end), these
tests fail until `python scripts/perf_table.py --write` is re-run — the
"fail loudly when README numbers diverge from the latest BENCH json"
mechanism.
"""

import importlib.util
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _perf_table():
    spec = importlib.util.spec_from_file_location(
        "perf_table", os.path.join(ROOT, "scripts", "perf_table.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _block(text, begin, end):
    m = re.search(re.escape(begin) + r"(.*?)" + re.escape(end), text, re.S)
    assert m, f"missing AUTOGEN markers {begin!r}"
    return m.group(1).strip()


def test_perf_doc_table_current():
    pt = _perf_table()
    rounds = pt.load_rounds()
    assert rounds, "no BENCH_r*.json in repo"
    with open(os.path.join(ROOT, "docs", "performance.md")) as f:
        doc = f.read()
    got = _block(doc, pt.BEGIN, pt.END)
    want = pt.render(rounds).strip()
    assert got == want, (
        "docs/performance.md AUTOGEN table is stale — run "
        "`python scripts/perf_table.py --write`"
    )


def test_readme_status_current():
    pt = _perf_table()
    rounds = pt.load_rounds()
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    got = _block(readme, pt.RM_BEGIN, pt.RM_END)
    want = pt.render_readme(rounds).strip()
    assert got == want, (
        "README.md AUTOGEN status block is stale — run "
        "`python scripts/perf_table.py --write`"
    )
