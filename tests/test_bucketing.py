"""Bucketed-layout shuffle elimination — plan evidence for the
persisted-partitioning posture (SURVEY.md §4: reuse a partitioning
across stages instead of re-shuffling per query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources import tables


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    df = tables.read_transcripts(spark, sf_dir).limit(20000)
    tables.write_bucketed(df, "tx_bucketed")
    yield spark.table("tx_bucketed")
    spark.sql("DROP TABLE IF EXISTS tx_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_window_over_bucketed_table_has_no_exchange(spark, bucketed, sf_dir):
    """The stable-ordering window (ordered_turns shape) over a
    conv_id-bucketed table must satisfy its clustering from the
    bucketing — no shuffle before the window."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = bucketed.withColumn("turn_seq", F.row_number().over(w))
    plan = _plan(out)
    assert "Window" in plan
    assert "Exchange" not in plan, plan
    # same query over the plain parquet path DOES shuffle — the
    # comparison that proves the bucketing is what removed it
    plain = tables.read_transcripts(spark, sf_dir)
    plain_out = plain.withColumn("turn_seq", F.row_number().over(w))
    assert "Exchange" in _plan(plain_out)


def test_cobucketed_join_has_no_exchange(spark, bucketed, sf_dir):
    """conv_id-keyed join of two co-bucketed tables: SortMergeJoin with
    zero exchanges (both sides already hash-partitioned alike)."""
    agg = (
        spark.table("tx_bucketed")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    tables.write_bucketed(
        agg, "tx_counts_bucketed", sort_cols=("conv_id",)
    )
    try:
        # hint("merge"): AQE would otherwise broadcast the tiny count
        # side here — the 100 TB case is two LARGE tables, where SMJ is
        # the strategy and co-bucketing is what deletes its exchanges
        joined = spark.table("tx_bucketed").hint("merge").join(
            spark.table("tx_counts_bucketed"), "conv_id"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness: the inner join must keep EVERY fact row (a
        # mis-bucketed read would drop rows — a null-check after an
        # inner join could never see that)
        assert joined.count() == spark.table("tx_bucketed").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS tx_counts_bucketed")


def test_bucketed_results_match_plain(spark, bucketed, sf_dir):
    """Layout never changes results: bucketed-table window == plain."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    a = bucketed.withColumn("turn_seq", F.row_number().over(w)).select(
        "conv_id", "turn_idx", "turn_seq"
    )
    plain = (
        tables.read_transcripts(spark, sf_dir).limit(20000)
        .withColumn("turn_seq", F.row_number().over(w))
        .select("conv_id", "turn_idx", "turn_seq")
    )
    assert a.exceptAll(plain).count() == 0 and plain.exceptAll(a).count() == 0
