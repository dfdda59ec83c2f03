"""Training-data cleaning pipeline over `documents`:

    language filter → quality filter → exact dedup (normalized
    fingerprint, keep min doc_id) → near-dup removal (MinHash-LSH
    candidates + exact Jaccard verification, drop the higher doc_id of
    each pair) → kept doc set

This is the canonical 100 TB corpus-cleaning DAG: every stage is a
narrow transformation or a key-shuffle; nothing is all-pairs
(the LSH bucket join bounds candidate generation), nothing collects.

Drop rule is pairwise-deterministic (drop b where a<b and
jaccard(a,b) ≥ t): a pure function of the pair set, so replays and
different partitionings give identical keep sets (no greedy
order-dependence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import text as T
from opentelemetry_collector_spark.operators import dedup

DEFAULT_QUALITY_PPM = 400_000
DEFAULT_JACCARD = 0.7


def clean_documents(
    docs: DataFrame,
    lang: str = "en",
    min_quality_ppm: int = DEFAULT_QUALITY_PPM,
    jaccard_threshold: float = DEFAULT_JACCARD,
    num_hashes: int = dedup.DEFAULT_NUM_HASHES,
    bands: int = dedup.DEFAULT_BANDS,
) -> DataFrame:
    """Returns the kept rows (doc_id + stage flags for observability)."""
    c = F.col("text")
    filtered = docs.filter(
        (T.lang_id(c) == lang) & (T.quality_score_ppm(c) >= min_quality_ppm)
    )
    # exact dedup on normalized fingerprint: keep the smallest doc_id
    w = Window.partitionBy(T.fingerprint(c)).orderBy(F.col("doc_id"))
    uniq = filtered.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")
    # near-dup removal among survivors: drop the larger id of each pair
    pairs = dedup.neardup_pairs_minhash(
        uniq, threshold=jaccard_threshold, num_hashes=num_hashes, bands=bands
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return uniq.join(drops, on="doc_id", how="left_anti")


def oracle_clean_documents(
    lang: str = "en",
    min_quality_ppm: int = DEFAULT_QUALITY_PPM,
    jaccard_threshold: float = DEFAULT_JACCARD,
    table: str = "documents",
    num_hashes: int = dedup.DEFAULT_NUM_HASHES,
    bands: int = dedup.DEFAULT_BANDS,
) -> str:
    """DuckDB mirror. The near-dup stage reproduces the LSH banding
    itself in SQL (dedup.oracle_lsh_cte) — parity does not depend on
    the LSH achieving full recall of the exact pair set."""
    lang_e = T.oracle_lang_id("text")
    q_e = T.oracle_quality_score_ppm("text")
    fp = T.oracle_fingerprint("text")
    # forward the LSH knobs: a mismatched banding config between query
    # and oracle would silently change the candidate (and drop) set
    lsh_cte = dedup.oracle_lsh_cte("uniq", num_hashes, bands)
    return f"""
        WITH filtered AS (
            SELECT * FROM {table}
            WHERE {lang_e} = '{lang}' AND {q_e} >= {min_quality_ppm}
        ), uniq AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY {fp}
                                             ORDER BY doc_id) AS rn
                FROM filtered
            ) WHERE rn = 1
        ), {lsh_cte},
        drops AS (
            SELECT DISTINCT id_b AS doc_id FROM scored
            WHERE jaccard >= {jaccard_threshold}
        )
        SELECT doc_id FROM uniq
        WHERE doc_id NOT IN (SELECT doc_id FROM drops)"""
