"""Coverage gate for the correctness artifacts (VERDICT r3 #2).

The driver's CORRECTNESS_r*.json has checked a frozen key subset since
round 2 while the registry kept growing; the local artifact
(CORRECTNESS_local_r*.json, emitted by
`python tools/check_correctness.py --json`) closes the visibility gap.
This test fails when ANY registered query lacks a row in the union of
the newest driver artifact and the newest local artifact — so adding a
query without regenerating the local artifact is a loud CI failure,
not silent missing coverage.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _newest(pattern: str) -> Path | None:
    def round_no(p: Path) -> int:
        m = re.search(r"_r(\d+)\.json$", p.name)
        return int(m.group(1)) if m else -1

    cands = [p for p in REPO.glob(pattern) if round_no(p) >= 0]
    return max(cands, key=round_no) if cands else None


def test_every_registered_query_has_a_correctness_row():
    import __spark_entry__ as entry

    registered = set(entry.queries())
    covered: set[str] = set()
    driver = _newest("CORRECTNESS_r*.json")
    if driver is not None:
        covered |= set(json.load(driver.open()))
    local = _newest("CORRECTNESS_local_r*.json")
    assert local is not None, (
        "no CORRECTNESS_local_r*.json artifact — run "
        "`python tools/check_correctness.py --json CORRECTNESS_local_rN.json`"
    )
    local_doc = json.load(local.open())
    covered |= set(local_doc["results"])
    missing = sorted(registered - covered)
    assert not missing, (
        f"registered queries with no correctness row in {driver and driver.name} "
        f"∪ {local.name}: {missing} — regenerate the local artifact"
    )


def test_local_artifact_is_green():
    """The checked-in local artifact must itself be a passing run —
    a stale artifact recording failures cannot satisfy the gate."""
    local = _newest("CORRECTNESS_local_r*.json")
    assert local is not None
    doc = json.load(local.open())
    bad = {
        k: v["match"]
        for k, v in doc["results"].items()
        if v["match"] not in ("ok", "rows_only")
    }
    assert not bad, f"local artifact records failures: {bad}"
    assert doc["passed"] == doc["checked"]
