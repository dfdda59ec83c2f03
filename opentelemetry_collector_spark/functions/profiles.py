"""Profiles signal (pdata/pprofile) — the fourth reference signal.

The reference stores profiles dictionary-encoded
(generated_profilesdictionary.go:44-83: FunctionTable / LocationTable /
StackTable; generated_sample.go:51 Sample.StackIndex;
generated_stack.go:51 Stack.LocationIndices, leaf first;
profiles.go:19-31 SampleCount). The Spark-first shape is the classic
fact + broadcast-dims star:

    samples (fact, huge)  ⋈B  stacks → locations → functions (tiny dims)

`hot_functions` computes the pprof-style hot list: per function,
  - self_ns:  Σ sample.value where the function owns the LEAF frame
  - total_ns: Σ sample.value where the function appears ANYWHERE in the
    stack (counted once per sample — recursion doesn't double-count)
  - n_samples: samples containing the function
Top-k by self time, bigint-deterministic tie-break on function_id.

Scale: samples is the only large table; every join is an explicit
F.broadcast of a dictionary dim, the stack explode fans out by mean
stack depth (≤ 8 here) and collapses again in the first hash
aggregate — no shuffle ever carries the fact table keyed by anything
but function_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark import fixtures


def read_profile_tables(spark: SparkSession) -> dict[str, DataFrame]:
    paths = fixtures.ensure_profiles()
    return {name: spark.read.parquet(p) for name, p in paths.items()}


def hot_functions(
    samples: DataFrame,
    stacks: DataFrame,
    locations: DataFrame,
    functions: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k functions by self time (see module docstring)."""
    frames = (
        samples.join(F.broadcast(stacks), "stack_id")
        .select(
            "sample_id",
            "value",
            F.posexplode("location_ids").alias("pos", "location_id"),
        )
        .join(F.broadcast(locations.select("location_id", "function_id")), "location_id")
    )
    # one row per (sample, function): value counted once even when the
    # function appears in several frames (recursion); leaf flag survives
    per_sf = frames.groupBy("sample_id", "function_id").agg(
        F.first("value").alias("value"),
        F.max((F.col("pos") == 0).cast("int")).alias("is_leaf"),
    )
    agg = per_sf.groupBy("function_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.col("value") * F.col("is_leaf")).alias("self_ns"),
        F.sum("value").alias("total_ns"),
    )
    return (
        agg.join(F.broadcast(functions.select("function_id", "name")), "function_id")
        .orderBy(F.col("self_ns").desc(), "function_id")
        .limit(k)
        .select("function_id", "name", "n_samples", "self_ns", "total_ns")
    )


def _oracle_frames_cte() -> str:
    """THE shared samples→frames WITH prefix for both profile oracles
    (incl. the subtle 1-based-DuckDB-lambda 'pos - 1' correction) —
    one definition so the two gates cannot silently disagree (r5
    review finding)."""
    p = fixtures.ensure_profiles()
    return f"""        WITH samples AS (SELECT * FROM read_parquet('{p["samples"]}')),
        stacks AS (SELECT * FROM read_parquet('{p["stacks"]}')),
        locations AS (SELECT * FROM read_parquet('{p["locations"]}')),
        functions AS (SELECT * FROM read_parquet('{p["functions"]}')),
        frames0 AS (
            SELECT s.sample_id, s.value,
                   unnest(list_transform(st.location_ids,
                          (x, i) -> {{'loc': x, 'pos': i}})) AS fr
            FROM samples s JOIN stacks st USING (stack_id)),
        frames AS (
            SELECT sample_id, value, fr.pos - 1 AS pos,
                   fr.loc AS location_id
            FROM frames0)"""


def oracle_hot_functions(k: int = 10) -> str:
    """DuckDB mirror over the same parquet bytes: frame position via an
    indexed-lambda struct unnest (lateral range(len(col)) is not
    supported), identical once-per-sample total and leaf-only self
    sums. DuckDB lambda index is 1-based — pos 1 is the leaf."""
    return f"""{_oracle_frames_cte()},
        per_sf AS (
            SELECT f.sample_id, l.function_id,
                   any_value(f.value) AS value,
                   max(CASE WHEN f.pos = 0 THEN 1 ELSE 0 END) AS is_leaf
            FROM frames f JOIN locations l USING (location_id)
            GROUP BY 1, 2),
        agg AS (
            SELECT function_id,
                   cast(count(*) AS bigint) AS n_samples,
                   cast(sum(value * is_leaf) AS bigint) AS self_ns,
                   cast(sum(value) AS bigint) AS total_ns
            FROM per_sf GROUP BY 1)
        SELECT a.function_id, fn.name, a.n_samples, a.self_ns, a.total_ns
        FROM agg a JOIN functions fn USING (function_id)
        ORDER BY a.self_ns DESC, a.function_id LIMIT {k}"""


def oracle_hot_functions_by_name(k: int = 10) -> str:
    """oracle_hot_functions keyed by function NAME — the identity the
    pprof round trip preserves (per-blob ids are local; names are the
    dictionary's cross-blob identity). Value-checks
    profilewire.encode→decode→hot_functions_from_frames."""
    return f"""{_oracle_frames_cte()},
        per_sf AS (
            SELECT f.sample_id, fn.name,
                   any_value(f.value) AS value,
                   max(CASE WHEN f.pos = 0 THEN 1 ELSE 0 END) AS is_leaf
            FROM frames f JOIN locations l USING (location_id)
                          JOIN functions fn USING (function_id)
            GROUP BY 1, 2)
        SELECT name,
               cast(count(*) AS bigint) AS n_samples,
               cast(sum(value * is_leaf) AS bigint) AS self_ns,
               cast(sum(value) AS bigint) AS total_ns
        FROM per_sf GROUP BY 1
        ORDER BY self_ns DESC, name LIMIT {k}"""
