"""Profiles signal (pdata/pprofile analog): hot-functions star query."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import profiles


def _mini_tables(spark):
    functions = spark.createDataFrame(
        [(0, "main", "main.go"), (1, "work", "work.go"), (2, "leafy", "leaf.go")],
        "function_id int, name string, filename string",
    )
    locations = spark.createDataFrame(
        [(0, 0, 10), (1, 1, 20), (2, 2, 30), (3, 2, 31)],
        "location_id int, function_id int, line int",
    )
    # stack 0: leafy←work←main; stack 1: work←main; stack 2 recursive
    # leafy←leafy←main (total must count leafy ONCE per sample)
    stacks = spark.createDataFrame(
        [(0, [2, 1, 0]), (1, [1, 0]), (2, [2, 3, 0])],
        "stack_id int, location_ids array<int>",
    )
    samples = spark.createDataFrame(
        [(0, 0, 0, 100), (1, 0, 1, 10), (2, 0, 2, 1000)],
        "sample_id long, profile_id int, stack_id int, value long",
    )
    return samples, stacks, locations, functions


def test_hot_functions_self_total_semantics(spark):
    samples, stacks, locations, functions = _mini_tables(spark)
    rows = {
        r["name"]: r
        for r in profiles.hot_functions(samples, stacks, locations, functions, k=10).collect()
    }
    # main: never a leaf, appears in all samples
    assert rows["main"]["self_ns"] == 0 and rows["main"]["total_ns"] == 1110
    assert rows["main"]["n_samples"] == 3
    # work: leaf of sample 1 only; in samples 0 and 1
    assert rows["work"]["self_ns"] == 10 and rows["work"]["total_ns"] == 110
    # leafy: leaf of samples 0 and 2; recursion in sample 2 counted once
    assert rows["leafy"]["self_ns"] == 1100 and rows["leafy"]["total_ns"] == 1100
    assert rows["leafy"]["n_samples"] == 2


def test_hot_functions_topk_deterministic(spark):
    samples, stacks, locations, functions = _mini_tables(spark)
    top = profiles.hot_functions(samples, stacks, locations, functions, k=1).collect()
    assert len(top) == 1 and top[0]["name"] == "leafy"


def test_hot_functions_plan_broadcasts_dims(spark):
    """All three dictionary joins must be broadcasts — the fact table
    is the only large input and must never shuffle on a dim key."""
    t = profiles.read_profile_tables(spark)
    df = profiles.hot_functions(t["samples"], t["stacks"], t["locations"], t["functions"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_fixture_deterministic(spark):
    paths = profiles.read_profile_tables(spark)
    n = paths["samples"].count()
    assert n == 4000
    # every stack's every location resolves to a function (no orphans)
    ex = (
        paths["stacks"].select(F.explode("location_ids").alias("location_id"))
        .join(paths["locations"], "location_id", "left_anti")
    )
    assert ex.count() == 0
