"""Deduplication operators over the `documents` table.

Exact + near-dup family for training-data pipelines:
- exact:       groupBy(md5(text)) keep min doc_id — one shuffle on a
               16-byte key, the 100 TB-safe baseline;
- normalized:  same on normalize_text;
- minhash+LSH: word-shingles → k minhash signatures → banded bucket
               keys → self-join per bucket. The self-join is on the
               band key ONLY (tiny buckets), never all-pairs; shuffle
               is O(docs·bands), candidate verification is per-bucket;
- n-gram Jaccard: exact similarity on LSH candidates (array_intersect
               over distinct shingle sets);
- simhash:     64-bit sign-of-sums fingerprint (vectorized pandas UDF),
               near-dups = hamming ≤ t via 4×16-bit chunk banding.

Engine-portable hashing: minhash uses md5 hex strings and LEXICOGRAPHIC
min — hex of fixed length preserves numeric order, so this is a valid
uniform minhash AND the DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from opentelemetry_collector_spark.functions.text import normalize_text, oracle_fingerprint

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4  # 4 bands × 4 rows


# ------------------------------------------------------------------ exact

def exact_dedup_keepers(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One surviving doc_id per distinct text (min id wins)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def normalized_dedup_keepers(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col))).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# ---------------------------------------------------------------- minhash

def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    words = F.split(normalize_text(text), " ")
    k = F.size(words) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return F.array_distinct(grams)


def _seeded_md5(seed: int):
    # NB: the lambda must take exactly ONE arg — F.transform passes the
    # array index to a second parameter, which would silently override a
    # default-arg seed binding.
    prefix = f"{seed}|"
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def minhash_signature(shingles: Column, num_hashes: int = DEFAULT_NUM_HASHES) -> Column:
    """Array of num_hashes minhash values (md5-hex strings, lexic. min)."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, _seeded_md5(i)))
            for i in range(num_hashes)
        ]
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism before CPU-dense
    per-row stages. Single-row-group parquet inputs scan as ONE task,
    which serializes the (interpreted higher-order-function) minhash /
    simhash work — measured 7.5× on the sf0.1 documents table."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_n: int = 3,
) -> DataFrame:
    sh = word_shingles(F.col(text_col), shingle_n)
    return _spread(df).withColumn("shingles", sh).withColumn(
        "minhash", minhash_signature(F.col("shingles"), num_hashes)
    )


def band_keys(sig: Column, bands: int = DEFAULT_BANDS, num_hashes: int = DEFAULT_NUM_HASHES) -> Column:
    rows = num_hashes // bands
    return F.array(
        *[
            F.concat_ws(
                "#", F.lit(str(b)), *[sig[b * rows + r] for r in range(rows)]
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing ≥1 LSH band bucket.

    Scale: explode to (band_key, id), self-join per bucket — shuffle on
    band_key. Hot buckets (boilerplate docs) are the skew risk; AQE
    skew-join splitting handles them, and the bucket join never
    materializes cross-bucket pairs.
    """
    # persist: m feeds THREE lazy branches (band keys, sh_a, sh_b) —
    # without it the scan + shingle work runs 3× (measured 2.7× slower);
    # the ContextCleaner unpersists when the frames are GC'd
    m = with_minhash(df, text_col, num_hashes, shingle_n).persist()
    # bucket-join NARROW (band_key, id) rows only: pair dedup shuffles
    # 16-byte tuples, never shingle arrays — at corpus scale the payload
    # join below touches each candidate id exactly once
    keyed = m.select(
        F.col(id_col).alias("id"),
        F.explode(band_keys(F.col("minhash"), bands, num_hashes)).alias("bk"),
    )
    a = keyed.select("bk", F.col("id").alias("id_a"))
    b = keyed.select("bk", F.col("id").alias("id_b"))
    pairs = (
        a.join(b, on="bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = m.select(F.col(id_col).alias("id"), F.col("shingles"))
    return (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
        .select("id_a", "id_b", "sh_a", "sh_b")
    )


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(F.array_union(sh_a, sh_b))
    return F.round(inter / F.greatest(union, F.lit(1)), 6)


def neardup_pairs_minhash(
    df: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact shingle Jaccard."""
    cand = lsh_candidate_pairs(df, id_col, text_col, **kw)
    return (
        cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def neardup_pairs_bruteforce(
    df: DataFrame, threshold: float = 0.7, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """All-pairs exact Jaccard — O(n²), the small-scale oracle for LSH
    recall tests only. Never the scale path."""
    s = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_n).alias("sh")
    )
    a = s.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- simhash

@pandas_udf(LongType())
def _simhash64(text: pd.Series) -> pd.Series:
    """Vectorized 64-bit simhash over whitespace tokens (Arrow batches).

    Per batch: token → stable 64-bit hash (md5-derived), sign-sum per
    bit, sign → fingerprint. numpy throughout, no per-row Python loops
    beyond the tokenization split.
    """
    import hashlib

    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text.fillna("")):
        toks = t.lower().split()
        if not toks:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            )
            bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            acc += 2 * bits - 1
        fp = np.uint64(0)
        for b in range(64):
            if acc[b] > 0:
                fp |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(fp.astype("int64"))
    return pd.Series(out)


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return _spread(df).withColumn("simhash", _simhash64(F.col(text_col)))


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ max_hamming.

    Scale path: band the 64-bit fingerprint into (max_hamming + 1)
    chunks — by pigeonhole, any pair within the distance budget shares
    ≥1 exact chunk, so the join is on chunk equality, never all-pairs.
    (A fixed chunk count would silently lose recall for larger budgets:
    4 chunks only guarantee hamming ≤ 3.)
    """
    # ≥2 chunks so the per-chunk mask always fits a signed 64-bit literal
    n_chunks = min(64, max(2, max_hamming + 1))
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]
    sh = with_simhash(df, "text").select(F.col(id_col).alias("id"), "simhash")
    chunk_exprs = []
    for c in range(n_chunks):
        lo, hi = bounds[c], bounds[c + 1]
        width = hi - lo
        mask = (1 << width) - 1
        chunk_exprs.append(
            F.concat_ws(
                ":",
                F.lit(str(c)),
                F.shiftrightunsigned(F.col("simhash"), lo)
                .bitwiseAND(F.lit(mask))
                .cast("string"),
            )
        )
    chunks = sh.select(
        "id", "simhash", F.explode(F.array(*chunk_exprs)).alias("chunk")
    )
    a = chunks.select(F.col("chunk"), F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = chunks.select(F.col("chunk"), F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    pairs = (
        a.join(b, on="chunk")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------------- oracle SQL

def oracle_exact_dedup(table: str = "documents") -> str:
    return f"""
        SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
               cast(count(*) AS bigint) AS n_dups
        FROM {table} GROUP BY 1"""


def oracle_normalized_dedup(table: str = "documents") -> str:
    return f"""
        SELECT {oracle_fingerprint('text')} AS text_hash,
               min(doc_id) AS keep_id, cast(count(*) AS bigint) AS n_dups
        FROM {table} GROUP BY 1"""


def oracle_shingles(col: str = "text", n: int = 3) -> str:
    words = f"string_split(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')), ' ')"
    return (
        f"list_distinct(CASE WHEN len({words}) >= {n} THEN "
        f"list_transform(range(1, len({words}) - {n - 2}), "
        f"i -> array_to_string({words}[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({words}, ' ')] END)"
    )


def oracle_neardup_pairs(threshold: float, table: str = "documents") -> str:
    """Exact all-pairs shingle-Jaccard — the recall GROUND TRUTH used by
    pytest to measure LSH recall. NOT used as the driver oracle (LSH can
    legitimately miss pairs; see oracle_neardup_pairs_lsh)."""
    sh = oracle_shingles("text")
    jac = (
        "round(len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0e0 / "
        "greatest(len(list_distinct(a.sh || b.sh)), 1), 6)"
    )
    return f"""
        WITH sh AS (SELECT doc_id, {sh} AS sh FROM {table})
        SELECT * FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, {jac} AS jaccard
            FROM sh a, sh b WHERE a.doc_id < b.doc_id
        ) WHERE jaccard >= {threshold}"""


def oracle_lsh_cte(
    table: str = "documents",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> str:
    """CTEs reproducing the EXACT LSH semantics in DuckDB: minhash
    (md5-hex lexicographic min), banded bucket keys, candidate pairs,
    verified Jaccard. The driver oracle mirrors the algorithm rather
    than assuming 100% recall of the exact pair set — parity holds for
    any data and any threshold."""
    sh = oracle_shingles("text")
    mh = oracle_minhash("sh", num_hashes)
    rows = num_hashes // bands
    band_list = ", ".join(
        "'" + str(b) + "#' || " + " || '#' || ".join(
            f"mh[{b * rows + r + 1}]" for r in range(rows)
        )
        for b in range(bands)
    )
    jac = (
        "round(len(list_filter(ma.sh, x -> list_contains(mb.sh, x))) * 1.0e0 / "
        "greatest(len(list_distinct(ma.sh || mb.sh)), 1), 6)"
    )
    return f"""
        m AS (SELECT doc_id, sh, {mh} AS mh
              FROM (SELECT doc_id, {sh} AS sh FROM {table})),
        keyed AS (SELECT doc_id AS id, unnest([{band_list}]) AS bk FROM m),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM keyed a JOIN keyed b ON a.bk = b.bk AND a.id < b.id),
        scored AS (SELECT c.id_a, c.id_b, {jac} AS jaccard
                   FROM cand c
                   JOIN m ma ON ma.doc_id = c.id_a
                   JOIN m mb ON mb.doc_id = c.id_b)"""


def oracle_neardup_pairs_lsh(
    threshold: float,
    table: str = "documents",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> str:
    return (
        f"WITH {oracle_lsh_cte(table, num_hashes, bands)} "
        f"SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= {threshold}"
    )


def oracle_minhash(shingles_expr: str, num_hashes: int = DEFAULT_NUM_HASHES) -> str:
    mins = ", ".join(
        f"list_min(list_transform({shingles_expr}, s -> md5('{i}|' || s)))"
        for i in range(num_hashes)
    )
    return f"[{mins}]"
