"""bench.py stdout contract: the driver keeps only a ~2,000-char tail of
bench stdout, so the single JSON line must fit the window *at the full
query-registry size* or the official perf record parses as null (r4/r5
both lost their artifacts this way).  Pins the compact-emit invariants
against the real registry so query growth can't silently re-break it."""

import json

import bench


def _full_result(n_extra: int = 0) -> dict:
    import __spark_entry__ as entry

    qs = {k: 1.2345 for k in entry.queries()}
    qs.update({f"future_query_with_a_long_name_{i:03d}": 9.8765
               for i in range(n_extra)})
    return {
        "metric": "pipeline_e2e_wall_seconds",
        "value": 0.9123,
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "turns": 600000,
        "turns_per_sec": 657735.4,
        "cpus": 32,
        "rows_out": {k: 60000 for k in qs},
    }


def test_compact_fits_driver_window_at_registry_size():
    line = bench._compact(_full_result())
    assert len(line) <= 2000
    d = json.loads(line)
    assert d["metric"] == "pipeline_e2e_wall_seconds"
    assert d["value"] == 0.9123
    assert d["unit"] == "sec"
    assert d["turns_per_sec"] == 657735.4
    assert d["n_queries"] == len(_full_result()["queries"])
    # headline queries survive; the full map is pointed at, not inlined
    assert "pipeline_e2e" in d["queries"]
    assert d["detail"] == "BENCH_RESULT.json"


def test_compact_fits_even_with_200_more_queries():
    line = bench._compact(_full_result(n_extra=200))
    assert len(line) <= 2000
    json.loads(line)


def test_compact_passes_small_payloads_through():
    res = {"metric": "scaling_efficiency", "value": 0.839, "unit": "ratio",
           "low_cpus": 2, "high_cpus": 8, "sf": 2.0}
    d = json.loads(bench._compact(res))
    assert d == res
