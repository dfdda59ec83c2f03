"""pprof wire codec (functions/profilewire.py): structure, presence,
dangling-reference loudness. The full-star round trip is value-checked
by the profile_pprof_roundtrip oracle row."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.functions import profilewire as PW


def test_profile_golden_structure():
    """Hand-checkable blob: string_table[0]='' and 1-based ids (pprof
    reserves 0), leaf-first sample locations, cpu/nanoseconds type."""
    blob = PW.encode_profile(
        samples=[([1, 0], 700)],  # leaf = location 1
        locations={0: (0, 10), 1: (1, 20)},
        functions={0: ("main", "a.go"), 1: ("leafFn", "b.go")},
    )
    out = PW.decode_profile(blob)
    assert out == [(["leafFn", "main"], 700)]
    # the raw string table starts with "" (decode collects field 6)
    from opentelemetry_collector_spark.functions.protowire import _fields

    strings = [v.decode() for f, _w, v in _fields(blob) if f == 6]
    assert strings[0] == "" and "cpu" in strings and "leafFn" in strings


def test_decode_rejects_dangling_reference():
    """A sample pointing at a location absent from the blob's own
    table must raise, not silently drop the frame."""
    blob = PW.encode_profile(
        samples=[([5], 1)], locations={0: (0, 1)}, functions={0: ("f", "g")}
    )
    with pytest.raises(ValueError, match="dangling"):
        PW.decode_profile(blob)


def test_spark_roundtrip_hot_list_matches_direct(spark):
    """encode→decode→hot-by-name equals hot_functions on the raw star
    (name-keyed; ids are per-blob)."""
    from opentelemetry_collector_spark.functions import profiles

    t = profiles.read_profile_tables(spark)
    via_wire = PW.hot_functions_from_frames(
        PW.decode_profiles(PW.encode_profiles(spark, t)), k=10
    ).collect()
    direct = profiles.hot_functions(
        t["samples"], t["stacks"], t["locations"], t["functions"], k=10
    ).collect()
    assert [
        (r["name"], r["n_samples"], r["self_ns"], r["total_ns"]) for r in via_wire
    ] == [
        (r["name"], r["n_samples"], r["self_ns"], r["total_ns"]) for r in direct
    ]


def test_negative_sample_value_roundtrips():
    """Sample.value is int64 (delta/contention profiles carry
    negatives) — decode must sign-extend the packed varint or -5 reads
    as 2^64-5 (r5 review finding, confirmed by execution)."""
    blob = PW.encode_profile(
        samples=[([0], -5)], locations={0: (0, 1)}, functions={0: ("f", "g")}
    )
    assert PW.decode_profile(blob) == [(["f"], -5)]


def test_blob_carries_only_reachable_dictionary_entries():
    """Global dictionaries handed to encode_profile must not inflate the
    blob: unreferenced locations/functions (and their strings) stay out,
    so blob size scales with profile content, not fleet dictionary size
    (r5 advice)."""
    samples = [([0], 9)]
    small = PW.encode_profile(
        samples, locations={0: (0, 1)}, functions={0: ("f", "g")}
    )
    big_locs = {0: (0, 1)} | {i: (i, 1) for i in range(1, 500)}
    big_fns = {0: ("f", "g")} | {
        i: (f"unused_fn_{i}", f"unused_file_{i}.go") for i in range(1, 500)
    }
    inflated = PW.encode_profile(samples, big_locs, big_fns)
    assert inflated == small  # byte-identical: nothing unreachable leaked
    assert PW.decode_profile(inflated) == [(["f"], 9)]


def test_decode_empty_packed_value_degrades_not_indexerror():
    """A Sample whose packed value field decodes to an empty list is a
    corruption shape: it must yield the default (0), never leak
    IndexError past the ValueError contract (r5 advice)."""
    from opentelemetry_collector_spark.functions.protowire import (
        _len_delim,
        _packed_varints,
    )

    sample = _packed_varints(1, [1]) + _len_delim(2, b"")  # empty value
    loc = PW.encode_profile(
        samples=[([0], 1)], locations={0: (0, 1)}, functions={0: ("f", "g")}
    )
    # graft the corrupt sample onto an otherwise-valid blob
    blob = _len_delim(2, sample) + loc
    out = PW.decode_profile(blob)
    assert (["f"], 0) in out


def test_encode_profiles_rejects_fleet_scale_dictionary(spark, monkeypatch):
    """Past PPROF_DICT_MAX_ROWS the closure-shipped encoder must fail
    LOUD before collecting to the driver (VERDICT r5 task #6)."""
    from opentelemetry_collector_spark.functions import profiles

    t = profiles.read_profile_tables(spark)
    monkeypatch.setattr(PW, "PPROF_DICT_MAX_ROWS", 2)
    with pytest.raises(ValueError, match="PPROF_DICT_MAX_ROWS"):
        PW.encode_profiles(spark, t)
