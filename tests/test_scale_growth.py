"""Two-scale candidate-growth gate (VERDICT r3 #1).

Pins ~linear candidate growth for EVERY dedup/ANN candidate generator:
the same generator, same parameters as its registered query, on 1× and
4× corpora from an identical generative process with scale-invariant
duplicate density (fixtures.ensure_scalegrowth). A quadratic defect —
the r2 thin-chunk simhash keys, 1-shared-fp winnow candidacy — reads
as ≈ 16× for the 4× corpus; the gate allows GROWTH_RATIO_MAX plus an
additive noise floor for generators whose 1× counts are tiny (the
incremental path finds single-digit candidates at 500 docs, where one
extra bucket collision would dominate a pure ratio).

Mirrors the reference's contract-test posture
(exporter/exportertest/contract_checker.go:27-83): an invariant the
implementation must keep, checked mechanically per round.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans import scale_growth

NOISE_FLOOR = 64  # absolute slack for single-digit 1× candidate counts
BASE_DOCS = 500  # CI scale; bench.py --scale-growth runs 5000/2000
BASE_VECS = 200


@pytest.fixture(scope="module")
def report(spark):
    return scale_growth.growth_report(
        spark, base_docs=BASE_DOCS, base_vecs=BASE_VECS
    )


@pytest.mark.parametrize("name", scale_growth.GENERATORS)
def test_candidate_growth_is_linear(report, name):
    g = report["generators"][name]
    lo, hi = g["x1"]["candidates"], g["x4"]["candidates"]
    limit = scale_growth.GROWTH_RATIO_MAX * lo + NOISE_FLOOR
    assert hi <= limit, (
        f"{name}: candidates {lo} → {hi} for a 4× corpus "
        f"(limit {limit:.0f}) — superlinear candidate generation"
    )


@pytest.mark.parametrize("name", scale_growth.GENERATORS)
def test_generators_find_planted_duplicates(report, name):
    """Anti-vacuity: a generator that emits zero candidates at both
    scales would pass the growth gate while finding nothing."""
    g = report["generators"][name]
    assert g["x4"]["results"] > 0, f"{name} found no duplicates at 4×"
