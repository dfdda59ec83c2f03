"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import parse
from opentelemetry_collector_spark.plans import config as cfg_mod
from opentelemetry_collector_spark.streaming import stateful


def test_parse_non_ascii_parity(spark):
    """Python \\w is Unicode-aware, Java/RE2 are ASCII-only: the arrow
    path must agree with native (and the DuckDB oracle) on non-ASCII."""
    rows = [
        (0, "[INFO] svc=café latency_ms=5 req_id=a:0 msg=b"),  # é → invalid
        (1, "[INFO] svc=api latency_ms=5 req_id=a:1 msg=b"),  # valid
        (2, "[WARN] svc=api latency_ms=7 req_id=a:2 msg=a b"),  # NBSP
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    native = {r["i"]: (r["valid"], r["svc"]) for r in parse.with_parsed(df, "native").collect()}
    arrow = {r["i"]: (r["valid"], r["svc"]) for r in parse.with_parsed(df, "arrow").collect()}
    assert native == arrow
    assert native[0][0] is False  # café not parsed by any engine


def test_config_multi_receiver_fan_in(spark, sf_dir):
    """All declared receivers feed the pipeline (collector fan-in), not
    just the first one."""
    raw = {
        "receivers": {"transcripts": {}, "transcripts/b": {}},
        "processors": {},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {"processors": []}}},
    }
    df = cfg_mod.build_frame(spark, cfg_mod.load_spec(raw), sf_dir)
    single = cfg_mod.build_frame(
        spark,
        cfg_mod.load_spec(dict(raw, receivers={"transcripts": {}})),
        sf_dir,
    )
    assert df.count() == 2 * single.count()


class _FakeState:
    """Minimal GroupState stub for unit-testing the tracker function."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_stateful_timeout_keeps_emitted_counter():
    fn = stateful._tracker(send_batch_size=8, timeout_ms=1000)
    # timeout with 5 pending after 2 emitted batches → flush as seq 2,
    # counter advances to 3 (NOT reset)
    st = _FakeState(value=(5, 2), timed_out=True)
    out = list(fn(("conv-x",), iter([]), st))
    assert len(out) == 1 and out[0]["batch_seq"].iloc[0] == 2
    assert out[0]["flush_reason"].iloc[0] == "timeout"
    assert st._v == (0, 3) and not st.removed
    # a resumed conversation continues from seq 3 — no duplicate keys
    st2 = _FakeState(value=(0, 3))
    out2 = list(fn(("conv-x",), iter([pd.DataFrame({"a": range(9)})]), st2))
    assert len(out2) == 1 and out2[0]["batch_seq"].iloc[0] == 3
    # idle-but-historied state is kept; never-emitted idle state is dropped
    st3 = _FakeState(value=(0, 4), timed_out=True)
    assert list(fn(("c",), iter([]), st3)) == [] and st3._v == (0, 4)
    st4 = _FakeState(value=(0, 0), timed_out=True)
    assert list(fn(("c",), iter([]), st4)) == [] and st4.removed


def test_simhash_dynamic_banding_recall(spark):
    """max_hamming budgets beyond 3 must still find pairs whose
    differing bits land in different 16-bit chunks (old fixed banding
    missed them)."""
    from opentelemetry_collector_spark.operators import dedup

    # craft two texts whose simhashes differ in a handful of scattered
    # bits: near-identical token multisets
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    df = spark.createDataFrame(
        [(0, base), (1, base + " kilo"), (2, "totally different words here xyz")],
        "doc_id long, text string",
    )
    sh = {
        r["doc_id"]: (r["simhash0"], r["simhash1"])
        for r in dedup.with_simhash(df).collect()
    }
    d01 = bin(sh[0][0] ^ sh[1][0]).count("1") + bin(sh[0][1] ^ sh[1][1]).count("1")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs(df, max_hamming=max(3, d01)).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == d01
