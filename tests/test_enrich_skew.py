"""Skew evidence for the enrich join family (VERDICT r3 #10).

The aggregate stage's adversarial skew probe exists since r2; this
covers the ENRICH path: a fact side where one key owns 30% of all rows
(the fixture's hot-conv profile, applied to the join key).

Two layers of defense, both pinned:
1. the production enrich is a BROADCAST join — the fact side never
   shuffles on the key, so key skew cannot concentrate (plan pin);
2. if a dim ever outgrows broadcast (forced sort-merge here), AQE's
   skew-join splits the hot partition (SortMergeJoin(skew=true) +
   AQEShuffleRead skewed in the final adaptive plan) with results
   identical to the broadcast path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import enrich as enrich_mod

N = 200_000
HOT = "hot_tool"


@pytest.fixture(scope="module")
def skewed_fact(spark):
    """30% of rows on one tool key, the rest spread over 97 keys; a
    payload column gives the hot partition real bytes."""
    return (
        spark.range(N)
        .select(
            F.when(F.col("id") % 10 < 3, F.lit(HOT))
            .otherwise(F.concat(F.lit("tool"), (F.col("id") % 97).cast("string")))
            .alias("tool"),
            F.col("id").alias("rid"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def tool_dim(spark):
    return spark.createDataFrame(
        [(HOT, "fam_hot")] + [(f"tool{i}", f"fam{i % 7}") for i in range(97)],
        "tool string, tool_family string",
    )


def test_broadcast_enrich_is_skew_immune_by_plan(skewed_fact, tool_dim):
    """The production path: broadcast join — the fact side is never
    hash-partitioned on the skewed key (no Exchange hashpartitioning
    on tool anywhere), so a hot key cannot form a hot partition."""
    out = skewed_fact.join(F.broadcast(tool_dim), "tool", "left")
    assert out.count() == N
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(tool" not in plan


def test_aqe_splits_skewed_enrich_join_with_result_parity(
    spark, skewed_fact, tool_dim
):
    """Forced sort-merge (broadcast disabled — the too-big-dim
    scenario): AQE must mark and split the skewed partition, and the
    result must match the broadcast path exactly."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the 30%-hot partition is ~6 MB here vs 256 MB defaults —
        # scaled thresholds keep the probe adversarial at test size
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        smj = skewed_fact.join(tool_dim, "tool", "left")
        smj_rows = smj.collect()
        plan = smj._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not mark the skewed join"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    bc = skewed_fact.join(F.broadcast(tool_dim), "tool", "left")
    assert sorted(map(tuple, smj_rows)) == sorted(map(tuple, bc.collect()))
    hot_fams = {r["tool_family"] for r in smj_rows if r["tool"] == HOT}
    assert hot_fams == {"fam_hot"}  # split partitions didn't drop/dup rows
