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


# ---------------------------------------------------------------- round 3


def test_empty_scheme_allowlist_denies_all(monkeypatch, tmp_path):
    """frozenset() must mean DENY ALL, not 'fall back to every
    provider' — the `or` idiom bug."""
    import pytest

    from opentelemetry_collector_spark.plans import config as cfg_mod

    p = tmp_path / "x.yaml"
    p.write_text("42")
    monkeypatch.setenv("SMUGGLE3", "${file:" + str(p) + "}")
    with pytest.raises(cfg_mod.ConfigError, match="disabled"):
        cfg_mod.resolve_config({"a": "${env:SMUGGLE3}"}, frozenset())


def test_png_truncated_raises_valueerror_only():
    """Truncated/corrupt PNGs must surface as ValueError (one
    quarantine type), never struct.error/zlib.error."""
    import numpy as np
    import pytest

    from opentelemetry_collector_spark.functions import png

    buf = png.encode(np.zeros((4, 4), dtype=np.uint8))
    for cut in (10, 20, len(buf) - 3):
        with pytest.raises(ValueError):
            png.decode(buf[:cut])


def test_decode_media_malformed_png_falls_back_to_stub():
    """A malformed PNG row degrades to the stub decode instead of
    killing the mapInPandas task."""
    import numpy as np

    from opentelemetry_collector_spark.functions import png
    from opentelemetry_collector_spark.operators import multimodal as mm

    bad = png.PNG_MAGIC + b"\x00\x00\x00\x0dIHDRjunkjunkjunk"
    arr = mm.decode_media(bad, "image/png")
    want = mm._decode_stub(bad, "image/png")
    assert arr.shape == want.shape and (arr == want).all()


def test_winnow_min_cand_clamped_to_min_shared(spark):
    """min_shared < 4 must honor the documented contract (pairs sharing
    >= min_shared fps), not the silent >=4 candidacy floor."""
    from opentelemetry_collector_spark.operators import dedup

    # two docs engineered to share a small fingerprint overlap
    shared = "the quick brown fox jumps over"
    rows = [
        (0, f"{shared} completely different tail alpha beta gamma"),
        (1, f"{shared} other ending entirely delta epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: set(r["winnow_fp"]) for r in dedup.with_winnow(df).collect()}
    n_shared = len(fps[0] & fps[1])
    assert n_shared >= 1
    pairs = dedup.neardup_pairs_winnow(df, min_shared=1).collect()
    assert [(r["id_a"], r["id_b"], r["n_shared"]) for r in pairs] == [(0, 1, n_shared)]


def test_reloadable_config_invalid_initial_raises(tmp_path):
    """The collector refuses to START on an invalid config; only
    reloads keep last-good."""
    import pytest

    from opentelemetry_collector_spark.plans.config import ConfigError
    from opentelemetry_collector_spark.streaming import micro

    cfg = tmp_path / "bad.yaml"
    cfg.write_text("processors:\n  filter:\n    column: role\n    bogus: [x]\n")
    with pytest.raises(ConfigError):
        micro.ReloadableConfig(str(cfg))


def test_reloadable_config_same_second_rewrite_detected(tmp_path):
    """Change detection is by CONTENT, not mtime — a same-tick rewrite
    must still swap."""
    import os
    import time

    from opentelemetry_collector_spark.streaming import micro

    cfg = tmp_path / "live.yaml"
    cfg.write_text("processors:\n  filter:\n    column: role\n    strict: [user]\n")
    rc = micro.ReloadableConfig(str(cfg))
    st = os.stat(cfg)
    cfg.write_text("processors:\n  filter:\n    column: role\n    strict: [tool]\n")
    os.utime(cfg, (st.st_atime, st.st_mtime))  # force identical mtime
    assert rc.poll() is True
    assert rc.filter_set.strict == ("tool",)


def test_debug_sink_sampling_requires_shared_counter(spark):
    import pytest

    from opentelemetry_collector_spark.sinks import writers

    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="_batch_counter"):
        writers.debug_sink(df, verbosity="normal", sampling_initial=1)


def test_null_pipeline_body_is_config_error():
    import pytest

    from opentelemetry_collector_spark.plans import config as cfg_mod

    raw = {
        "receivers": {"transcripts": {}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": None}},
    }
    with pytest.raises(cfg_mod.ConfigError):
        cfg_mod.load_service(raw)
    raw["service"]["pipelines"] = {"logs": "scalar"}
    with pytest.raises(cfg_mod.ConfigError):
        cfg_mod.load_service(raw)


def test_set_overrides_merge_is_recursive():
    from opentelemetry_collector_spark.plans import config as cfg_mod

    raw = {"a": {"b": {"c": {"e": 2}}}}
    out = cfg_mod.apply_set_overrides(raw, ["a.b={c: {d: 1}}"])
    assert out["a"]["b"]["c"] == {"e": 2, "d": 1}  # sibling key survives
