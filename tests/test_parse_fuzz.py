"""Property-based parse fuzz (the pdata fuzz_test.go analog).

Hypothesis generates arbitrary text payloads; the Spark parse must
(a) never crash, (b) agree exactly with a pure-Python `re` oracle on
both validity and every extracted field — the byte-stable parsing
requirement (SURVEY.md §7). One Spark job per example would be slow,
so each example is a whole BATCH of strings evaluated in one pass.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.functions import parse

_PY = re.compile(parse.PARSE_PATTERN)

# mix of near-miss structured strings and arbitrary junk
_level = st.sampled_from(["DEBUG", "INFO", "WARN", "ERROR", "FATAL", "debug", ""])
_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=0, max_size=8
)
_structured = st.builds(
    lambda lv, svc, lat, rid, msg: f"[{lv}] svc={svc} latency_ms={lat} req_id={rid} msg={msg}",
    _level,
    _word,
    st.one_of(st.integers(0, 10**6).map(str), _word),
    _word,
    _word,
)
_junk = st.text(min_size=0, max_size=60).filter(lambda s: "\n" not in s and "\r" not in s)
_payload = st.one_of(_structured, _junk)


def _py_parse(s: str):
    m = _PY.match(s)
    if not m:
        return (None, None, None, None, None, False)
    lvl, svc, lat, rid, msg = m.groups()
    return (lvl, svc, int(lat), rid, msg, True)


@settings(max_examples=8, deadline=None)
@given(st.lists(_payload, min_size=1, max_size=120))
def test_parse_matches_python_re(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = {
        r["i"]: (r["level"], r["svc"], r["latency_ms"], r["req_id"], r["msg"], r["valid"])
        for r in parse.with_parsed(df, "native").collect()
    }
    for i, t in enumerate(texts):
        assert rows[i] == _py_parse(t), f"disagreement on {t!r}"
