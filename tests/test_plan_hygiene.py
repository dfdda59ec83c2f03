"""Plan hygiene across the whole driver query surface.

SURVEY.md §7 hard requirements, enforced mechanically for EVERY
registered query:
- no row-at-a-time Python anywhere (BatchEvalPython);
- ArrowEvalPython / mapInPandas only in the queries that declare a
  vectorized-UDF stage;
- no CartesianProduct except the documented brute-force verification
  baselines (embedding_neardup);
- transcripts scans must prune columns (never read all 6 columns when
  fewer are needed).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

ARROW_OK = {
    "pipeline_e2e_arrow",
    "parse_turns_arrow",
    "media_features",
    "proto_roundtrip",  # wire-format encode/decode is export-boundary Python
    "spans_roundtrip",  # same: per-signal wire codecs (signalwire.py)
    "metrics_roundtrip",
    # declared dense-numeric kernel: one numpy matmul per Arrow batch
    # (similarity.band_keys_arrow) replaces ~1 ms/row of interpreted
    # hyperplane dot products
    "embedding_neardup_lsh",
    "embedding_dedup",
    # pprof blobs: per-profile applyInPandas marshal + mapInPandas
    # parse — export-boundary Python like the other wire codecs (r5)
    "profile_pprof_roundtrip",
    "media_frames",  # AVI decode per frame — export-boundary Python
}
CARTESIAN_OK = {"embedding_neardup"}  # documented O(n²) baseline

_QUERIES = sorted(entry.queries())


@pytest.mark.parametrize("key", _QUERIES)
def test_plan_hygiene(spark, sf_dir, key):
    df = entry.queries()[key](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{key}: row-at-a-time Python UDF"
    if key not in ARROW_OK:
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
            f"{key}: undeclared Python stage"
        )
    if key not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{key}: accidental cross join"


def test_transcript_scan_prunes_columns(spark, sf_dir):
    """A 3-column projection must not read all 6 transcript columns.

    clearCache first: a cached full-column transcripts frame (other
    tests' session-scoped fixture) would otherwise substitute an
    InMemoryRelation whose inner scan reads every column."""
    spark.catalog.clearCache()
    df = entry.queries()["filter_regexp"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l and "transcripts" in l]
    assert scan, "no transcripts scan found"
    assert "role" not in scan[0] and "tool" not in scan[0], scan[0]
