"""BPE tokenizer training + segmentation (functions/bpe.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import bpe


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_spark_training_matches_python_reference(docs):
    """The Spark training loop (corpus agg → vocab-table rounds) must
    produce EXACTLY the reference merge sequence — same counting, same
    lexicographic tie-break — and be invariant to partitioning."""
    merges = bpe.bpe_train(docs, num_merges=12)
    texts = [r["text"] for r in docs.select("text").collect()]
    assert merges == bpe.reference_bpe(texts, num_merges=12)
    assert merges == bpe.bpe_train(docs.repartition(7), num_merges=12)
    assert len(merges) == 12  # the corpus supports ≥12 productive merges


def test_segmentation_reconstructs_text_and_compresses(docs):
    """Token arrays must concatenate back to the normalized text with
    spaces removed (segmentation loses nothing), and trained merges
    must actually fire (some multi-char tokens)."""
    merges = bpe.bpe_train(docs.limit(50), num_merges=8)
    out = (
        docs.limit(50)
        .select(
            "doc_id",
            F.col("text"),
            bpe.segment_expr(F.col("text"), merges).alias("toks"),
        )
        .collect()
    )
    multi = 0
    for r in out:
        norm = " ".join(r["text"].lower().split())
        assert "".join(r["toks"]) == norm.replace(" ", "")
        multi += sum(1 for t in r["toks"] if len(t) > 1)
    assert multi > 0


def test_single_char_and_empty_words():
    """1-char words (single fused symbol, no pairs) and NULL/empty text
    must not break training or segmentation."""
    texts = ["a a a b", None, "", "a b a b"]
    merges = bpe.reference_bpe(texts, num_merges=4)
    # 'a'+EOW is ONE fused symbol — no intra-word pairs exist at all
    assert merges == []


def test_eow_distinguishes_final_position(docs):
    """The end-of-word marker must keep word-final merges distinct from
    word-internal ones: a merge ending in EOW only fires at word end."""
    merges = bpe.bpe_train(docs, num_merges=12)
    finals = [m for m in merges if m[1].endswith(bpe.EOW)]
    internals = [m for m in merges if not m[1].endswith(bpe.EOW)]
    assert finals and internals  # both kinds learned on this corpus
