"""Training-data cleaning pipeline: stage semantics + the LSH-recall
property that licenses the exact-pairs SQL oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import dedup
from opentelemetry_collector_spark.plans import docs_pipeline


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_lsh_exact_recall_licenses_oracle(spark, sf_dir):
    """The driver oracle for neardup_minhash/docs_clean_pipeline uses
    exact all-pairs Jaccard; valid only while LSH recall is 100% on the
    fixture at the query threshold. Pin that property here."""
    docs = _docs(spark, sf_dir)
    for thr in (0.5, 0.7):
        exact = {
            (r["id_a"], r["id_b"])
            for r in dedup.neardup_pairs_bruteforce(docs, threshold=thr).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in dedup.neardup_pairs_minhash(docs, threshold=thr).collect()
        }
        assert lsh == exact, f"LSH recall broke at threshold {thr}"


def test_clean_pipeline_stages_monotone(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    kept = docs_pipeline.clean_documents(docs)
    n_docs, n_kept = docs.count(), kept.count()
    assert 0 < n_kept < n_docs
    # kept ids are a subset of input ids
    assert kept.join(docs, "doc_id", "left_anti").count() == 0
    # no near-dup pair survives within the kept set
    pairs = dedup.neardup_pairs_minhash(kept, threshold=docs_pipeline.DEFAULT_JACCARD)
    assert pairs.count() == 0


def test_clean_pipeline_partition_invariant(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in docs_pipeline.clean_documents(docs).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in docs_pipeline.clean_documents(docs.repartition(13))
        .select("doc_id")
        .collect()
    }
    assert a == b
