"""Corpus-shaping operators for a training-data pipeline.

Three classic pre-training stages, all pure Catalyst with exact DuckDB
oracle mirrors (the public heuristics are from the C4 and Gopher
paper families — word-count / mean-word-length / symbol-ratio /
alpha-ratio document rules; per-source mixture sampling; eval-set
contamination flagging):

- **quality_rules**: per-document rule columns + a keep flag. Ratios
  are exact integers (permille via floor of a single int division) so
  both engines compute bit-identical values — float rounding is the
  classic oracle-parity trap (see spark-duckdb pitfalls memo).
- **mix_sample**: deterministic per-source Bernoulli sampling from an
  md5 hash of (source, doc_id) — reproducible across runs, engines
  and cluster sizes, ZERO shuffle (pure map-side predicate). This is
  how a training mix ("2 parts src0 : 1 part src3") is shaped at
  100 TB without a global sort or RNG state.
- **contamination**: documents sharing word n-grams with a benchmark
  (eval) set. The benchmark gram set is tiny → broadcast join; the
  corpus side never shuffles on the gram key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.text import (
    normalize_text,
    oracle_word_grams,
    spread_to_parallelism,
    word_grams,
)
from opentelemetry_collector_spark.operators.dedup import _md5_32, _oracle_md5_32

# Gopher-style rule thresholds (permille where ratios)
MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN_MILLI = 3_000  # 3.0 chars
MAX_MEAN_WORD_LEN_MILLI = 10_000  # 10.0 chars
MAX_SYMBOL_PERMILLE = 100  # ≤10% non-alphanumeric-space chars
MIN_ALPHA_WORD_PERMILLE = 800  # ≥80% words contain a letter


def _words(text: Column) -> Column:
    """Non-empty words of the normalized text (NULL ≡ '' on both
    engines; split('') yields [''] which the filter drops)."""
    return F.filter(
        F.split(F.coalesce(normalize_text(text), F.lit("")), " "),
        lambda w: w != "",
    )


def quality_rules(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """C4/Gopher-style document quality rules as columns.

    Every ratio is floor(int·scale / int) — single integer division,
    bit-identical in DuckDB (oracle_quality_rules)."""
    words = _words(F.col(text_col))
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    n_words = F.size(words).cast("long")
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_chars = F.length(norm).cast("long")
    n_symbols = n_chars - F.length(
        F.regexp_replace(norm, r"[^a-z0-9 ]", "")
    ).cast("long")
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    ).cast("long")
    mean_len_milli = F.floor(total_word_chars * 1000 / F.greatest(n_words, F.lit(1)))
    symbol_permille = F.floor(n_symbols * 1000 / F.greatest(n_chars, F.lit(1)))
    alpha_permille = F.floor(n_alpha_words * 1000 / F.greatest(n_words, F.lit(1)))
    keep = (
        n_words.between(MIN_WORDS, MAX_WORDS)
        & mean_len_milli.between(MIN_MEAN_WORD_LEN_MILLI, MAX_MEAN_WORD_LEN_MILLI)
        & (symbol_permille <= MAX_SYMBOL_PERMILLE)
        & (alpha_permille >= MIN_ALPHA_WORD_PERMILLE)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_len_milli.cast("long").alias("mean_word_len_milli"),
        symbol_permille.cast("long").alias("symbol_permille"),
        alpha_permille.cast("long").alias("alpha_word_permille"),
        keep.alias("keep"),
    )


def oracle_quality_rules(table: str = "docs_all") -> str:
    norm = rf"coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '')"
    words = f"list_filter(string_split({norm}, ' '), w -> w <> '')"
    return f"""
        WITH q AS (
          SELECT doc_id,
                 len({words})::BIGINT AS n_words,
                 list_sum(list_transform({words}, w -> length(w)))::BIGINT
                   AS total_word_chars,
                 length({norm})::BIGINT AS n_chars,
                 (length({norm}) -
                  length(regexp_replace({norm}, '[^a-z0-9 ]', '', 'g')))::BIGINT
                   AS n_symbols,
                 len(list_filter({words}, w -> regexp_matches(w, '[a-z]')))::BIGINT
                   AS n_alpha_words
          FROM {table}),
        r AS (
          SELECT doc_id, n_words,
                 floor(coalesce(total_word_chars, 0) * 1000 /
                       greatest(n_words, 1))::BIGINT AS mean_word_len_milli,
                 floor(n_symbols * 1000 / greatest(n_chars, 1))::BIGINT
                   AS symbol_permille,
                 floor(n_alpha_words * 1000 / greatest(n_words, 1))::BIGINT
                   AS alpha_word_permille
          FROM q)
        SELECT doc_id, n_words, mean_word_len_milli, symbol_permille,
               alpha_word_permille,
               (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                AND mean_word_len_milli BETWEEN {MIN_MEAN_WORD_LEN_MILLI}
                                            AND {MAX_MEAN_WORD_LEN_MILLI}
                AND symbol_permille <= {MAX_SYMBOL_PERMILLE}
                AND alpha_word_permille >= {MIN_ALPHA_WORD_PERMILLE}) AS keep
        FROM r"""


# ------------------------------------------------------------ mix sample

PPM = 1_000_000


def _sample_hash(source: Column, doc_id: Column) -> Column:
    """Deterministic per-row uniform in [0, 1e6): the shared 32-bit
    md5 primitive (dedup._md5_32) over 'source:doc_id'. NULL source
    hashes as '' on BOTH engines (concat_ws would silently drop the
    NULL here while the oracle's || propagates it — the coalesce keeps
    the two engines on the same branch)."""
    key = F.concat_ws(":", F.coalesce(source, F.lit("")), doc_id.cast("string"))
    return _md5_32(key) % PPM


def mix_sample(
    df: DataFrame,
    rates_ppm: dict[str, int],
    default_ppm: int = 0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Keep each row with its source's rate: hash(source, id) < rate.

    Deterministic (same rows every run, any cluster size), stateless,
    no shuffle — the sampling predicate rides the scan. Unknown (and
    NULL) sources fall to default_ppm (0 = drop, the explicit-mix
    posture)."""
    rate = F.lit(default_ppm)
    for src, ppm in sorted(rates_ppm.items()):
        rate = F.when(F.col(source_col) == src, F.lit(int(ppm))).otherwise(rate)
    return df.filter(_sample_hash(F.col(source_col), F.col(id_col)) < rate)


def oracle_mix_sample(
    rates_ppm: dict[str, int], table: str = "documents", default_ppm: int = 0
) -> str:
    cases = " ".join(
        f"WHEN source = '{src}' THEN {int(ppm)}"
        for src, ppm in sorted(rates_ppm.items())
    )
    h = _oracle_md5_32("coalesce(source, '') || ':' || doc_id")
    return f"""
        SELECT doc_id, source FROM {table}
        WHERE {h} % {PPM} < (CASE {cases} ELSE {default_ppm} END)"""


# --------------------------------------------------------- contamination

CONTAM_GRAM_N = 3
CONTAM_BENCH_MOD = 97  # doc_id % 97 == 0 → the held-out benchmark set


def contamination(
    df: DataFrame,
    gram_n: int = CONTAM_GRAM_N,
    bench_mod: int = CONTAM_BENCH_MOD,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus documents sharing ≥ min_shared distinct word n-grams with
    the benchmark set (train/eval contamination flagging). The bench
    gram set is tiny and broadcast; corpus docs never shuffle on the
    gram key. Benchmark members are excluded from the output — the
    question is which TRAINING docs leak eval content."""
    grams = F.array_distinct(word_grams(F.col(text_col), gram_n))
    bench = (
        df.filter(F.col(id_col) % bench_mod == 0)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    # single-row-group parquet scans as ONE task; the gram explode is
    # the CPU-dense stage, so spread it first (the dedup._spread rule)
    corpus = spread_to_parallelism(
        df.filter(F.col(id_col) % bench_mod != 0)
    ).select(F.col(id_col), F.explode(grams).alias("gram"))
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def oracle_contamination(
    gram_n: int = CONTAM_GRAM_N,
    bench_mod: int = CONTAM_BENCH_MOD,
    min_shared: int = 1,
    table: str = "docs_all",
) -> str:
    grams = oracle_word_grams("text", gram_n)
    return f"""
        WITH bench AS (
          SELECT DISTINCT unnest(list_distinct({grams})) AS gram
          FROM {table} WHERE doc_id % {bench_mod} = 0),
        corpus AS (
          SELECT doc_id, unnest(list_distinct({grams})) AS gram
          FROM {table} WHERE doc_id % {bench_mod} <> 0)
        SELECT corpus.doc_id,
               count(DISTINCT corpus.gram)::BIGINT AS n_shared_grams
        FROM corpus JOIN bench USING (gram)
        GROUP BY 1 HAVING count(DISTINCT corpus.gram) >= {min_shared}"""


# ------------------------------------------------------ sequence packing

PACK_BUDGET_TOKENS = 256


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = PACK_BUDGET_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk sequence packing — the pretraining batch
    shape: documents in deterministic id order form ONE logical token
    stream; training chunk k owns stream positions [k·B, (k+1)·B).
    Emits each document's placement: the chunk holding its first
    token, its offset inside that chunk, and how many chunks it spans
    (documents straddle chunk boundaries; the stream is cut, not the
    documents padded).

    Scale: the global running token offset uses the two-level scheme
    shared with batch assignment (operators/batch._two_level_running,
    empty shard key set → one logical stream) — per-partition partial
    sums plus broadcast offsets, never a full-corpus single-reducer
    window. Placement is a pure function of (id order, token counts):
    replay-stable and cluster-size-independent."""
    from opentelemetry_collector_spark.functions.text import token_count
    from opentelemetry_collector_spark.operators.batch import _two_level_running

    n_tok = F.coalesce(token_count(F.col(text_col)), F.lit(0))
    joined, cum = _two_level_running(
        df, shard_keys=(), order_keys=(id_col,), weight=n_tok
    )
    start = (cum - F.col("_w")).alias("start")
    b = F.lit(budget_tokens)
    chunk_id = F.floor(start / b)
    return joined.select(
        F.col(id_col),
        F.col("_w").alias("n_tokens"),
        chunk_id.cast("long").alias("chunk_id"),
        (start % b).cast("long").alias("offset_in_chunk"),
        F.when(F.col("_w") == 0, F.lit(0))
        .otherwise(F.floor((start + F.col("_w") - 1) / b) - chunk_id + 1)
        .cast("long")
        .alias("chunks_spanned"),
    )


def oracle_pack_sequences(
    budget_tokens: int = PACK_BUDGET_TOKENS, table: str = "documents"
) -> str:
    from opentelemetry_collector_spark.functions.text import oracle_token_count

    n = oracle_token_count("text")
    return f"""
        WITH t AS (SELECT doc_id, coalesce({n}, 0)::BIGINT AS n_tokens
                   FROM {table}),
        c AS (SELECT doc_id, n_tokens,
                     (sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens) AS start
              FROM t)
        SELECT doc_id, n_tokens,
               floor(start / {budget_tokens})::BIGINT AS chunk_id,
               (start % {budget_tokens})::BIGINT AS offset_in_chunk,
               (CASE WHEN n_tokens = 0 THEN 0
                     ELSE floor((start + n_tokens - 1) / {budget_tokens})
                          - floor(start / {budget_tokens}) + 1 END)::BIGINT
                 AS chunks_spanned
        FROM c"""
