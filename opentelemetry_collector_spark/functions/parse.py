"""Parse stage: extract OTLP-like attributes from the transcript text.

The reference receives structured OTLP payloads
(receiver/otlpreceiver/otlp.go:88-128); our raw input is a text column,
so "receive" = vectorized grok/regex extraction. Two implementations
with identical semantics (equality-tested):

- ``with_parsed_native``: pure Catalyst ``regexp_extract`` expressions —
  JVM-side, whole-stage-codegen, the fast path at 100 TB (no Python at
  all, no Arrow transfer);
- ``with_parsed_arrow``: one vectorized ``pandas_udf`` over the text
  column (Arrow batch transfer, pandas ``str.extract`` — batch-at-a-time,
  never per-row Python). This is the extension point for grok patterns
  Catalyst regex can't express; it mirrors the reference's pluggable
  consumer interface (consumer/logs.go:15-20).

Unparseable rows get ``valid = false`` and are quarantined by the
router — the analog of permanent (non-retryable) errors dropped in
retry_sender.go:100-102.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# One pattern, locked semantics (SURVEY.md §7: byte-stable parsing).
# Kept to the common regex subset so Java (Spark), RE2 (DuckDB) and
# Python (pandas) agree exactly.
PARSE_PATTERN = (
    r"^\[(DEBUG|INFO|WARN|ERROR)\] svc=(\w+) latency_ms=(\d+) "
    r"req_id=(\S+) msg=(\S+)$"
)

PARSED_STRUCT = StructType(
    [
        StructField("level", StringType()),
        StructField("svc", StringType()),
        StructField("latency_ms", LongType()),
        StructField("req_id", StringType()),
        StructField("msg", StringType()),
    ]
)

PARSED_COLS = ["level", "svc", "latency_ms", "req_id", "msg"]


def _nonempty(c: Column) -> Column:
    return F.when(c != "", c)


def parsed_columns_native(text: Column) -> dict[str, Column]:
    """Catalyst-native extraction; '' (regexp_extract's no-match) → null."""
    lvl = F.regexp_extract(text, PARSE_PATTERN, 1)
    svc = F.regexp_extract(text, PARSE_PATTERN, 2)
    lat = F.regexp_extract(text, PARSE_PATTERN, 3)
    req = F.regexp_extract(text, PARSE_PATTERN, 4)
    msg = F.regexp_extract(text, PARSE_PATTERN, 5)
    return {
        "level": _nonempty(lvl),
        "svc": _nonempty(svc),
        "latency_ms": _nonempty(lat).cast("long"),
        "req_id": _nonempty(req),
        "msg": _nonempty(msg),
    }


def with_parsed_native(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = parsed_columns_native(F.col(text_col))
    df = df.withColumns(cols)
    return df.withColumn("valid", F.col("level").isNotNull())


@pandas_udf(PARSED_STRUCT)
def _parse_udf(text: pd.Series) -> pd.DataFrame:
    import re

    # Arrow-batched: one str.extract per batch, zero per-row Python.
    # re.ASCII: Python \w/\d/\s are Unicode-aware by default, but Java
    # (native path) and RE2 (DuckDB oracle) treat them ASCII-only — the
    # locked-semantics contract requires all three engines to agree on
    # non-ASCII payloads (e.g. 'svc=café' must NOT parse).
    out = text.str.extract(re.compile(PARSE_PATTERN, re.ASCII))
    out.columns = PARSED_COLS
    out["latency_ms"] = pd.to_numeric(out["latency_ms"], errors="coerce").astype(
        "Int64"
    )
    return out


def with_parsed_arrow(df: DataFrame, text_col: str = "text") -> DataFrame:
    df = df.withColumn("_p", _parse_udf(F.col(text_col)))
    df = df.withColumns({c: F.col(f"_p.{c}") for c in PARSED_COLS}).drop("_p")
    return df.withColumn("valid", F.col("level").isNotNull())


def with_parsed(df: DataFrame, method: str = "native", text_col: str = "text") -> DataFrame:
    """Parse dispatcher. 'native' is the default hot path; 'arrow' is the
    vectorized-UDF path required for grok patterns beyond Catalyst regex."""
    if method == "native":
        return with_parsed_native(df, text_col)
    if method == "arrow":
        return with_parsed_arrow(df, text_col)
    raise ValueError(f"unknown parse method {method!r}")


# DuckDB-equivalent SQL fragment for the oracle (same pattern, same
# null-on-no-match semantics).
def oracle_parse_fragment(table: str = "t") -> str:
    pat = PARSE_PATTERN.replace("'", "''")
    return f"""
      nullif(regexp_extract({table}.text, '{pat}', 1), '') AS level,
      nullif(regexp_extract({table}.text, '{pat}', 2), '') AS svc,
      cast(nullif(regexp_extract({table}.text, '{pat}', 3), '') AS bigint) AS latency_ms,
      nullif(regexp_extract({table}.text, '{pat}', 4), '') AS req_id,
      nullif(regexp_extract({table}.text, '{pat}', 5), '') AS msg,
      (nullif(regexp_extract({table}.text, '{pat}', 1), '') IS NOT NULL) AS valid
    """
