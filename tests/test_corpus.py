"""Corpus-shaping operators (operators/corpus.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import corpus


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_quality_rules_split_and_edges(spark, docs):
    out = corpus.quality_rules(docs)
    kept = out.filter("keep").count()
    total = out.count()
    assert 0 < kept < total  # the rules actually separate the fixture
    # targeted edge rows
    edge = spark.createDataFrame(
        [
            (1, None),  # NULL text → 0 words → drop
            (2, "ok " * 30),  # 30 short words: mean len 2.0 < 3.0 → drop
            (3, "@@ ## $$ %% " * 10),  # symbols, no alpha words → drop
            (4, "steady reasonable words " * 10),  # clean → keep
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in corpus.quality_rules(edge).collect()}
    assert not rows[1]["keep"] and rows[1]["n_words"] == 0
    assert not rows[2]["keep"] and rows[2]["mean_word_len_milli"] == 2000
    assert not rows[3]["keep"] and rows[3]["alpha_word_permille"] == 0
    assert rows[4]["keep"]


def test_mix_sample_rates_and_determinism(docs):
    rates = {"src0": 1_000_000, "src1": 500_000, "src2": 0}
    out = corpus.mix_sample(docs, rates)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n0 = docs.filter("source = 'src0'").count()
    n1 = docs.filter("source = 'src1'").count()
    assert by_src.get("src0") == n0  # rate 1.0 keeps everything
    assert "src2" not in by_src  # rate 0 drops everything
    assert set(by_src) == {"src0", "src1"}  # unknown sources default-drop
    assert 0.3 * n1 < by_src.get("src1", 0) < 0.7 * n1  # ~half
    # deterministic: same rows on a reshuffled input
    again = {
        r["doc_id"]
        for r in corpus.mix_sample(docs.repartition(7), rates).collect()
    }
    assert again == {r["doc_id"] for r in out.collect()}


def test_mix_sample_is_shuffle_free(docs):
    plan = (
        corpus.mix_sample(docs, {"src0": 500_000})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure scan + filter


def test_contamination_excludes_benchmark_and_flags_copies(spark):
    rows = [(i, f"unique text number {i} about topic{i} end") for i in range(1, 300)]
    rows.append((0, "held out benchmark question about spark joins"))  # bench (0 % 97 == 0)
    rows.append((150, "held out benchmark question about spark joins"))  # leaked copy
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_shared_grams"] for r in corpus.contamination(df).collect()}
    assert 150 in out and out[150] >= 4  # the verbatim leak is flagged
    assert 0 not in out and 97 not in out and 194 not in out  # bench excluded


def test_pack_sequences_stream_invariants(docs):
    """Concat-then-chunk: placements tile the token stream exactly —
    each doc starts where the previous (by id) ended, offsets stay
    under the budget, span counts match the arithmetic — and the
    assignment is replay-stable under repartitioning."""
    B = 64
    out = corpus.pack_sequences(docs, budget_tokens=B).collect()
    rows = sorted(out, key=lambda r: r["doc_id"])
    stream_pos = 0
    for r in rows:
        assert r["chunk_id"] == stream_pos // B
        assert r["offset_in_chunk"] == stream_pos % B
        if r["n_tokens"]:
            want_span = (stream_pos + r["n_tokens"] - 1) // B - stream_pos // B + 1
            assert r["chunks_spanned"] == want_span
        assert 0 <= r["offset_in_chunk"] < B
        stream_pos += r["n_tokens"]
    again = corpus.pack_sequences(docs.repartition(13), budget_tokens=B).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_corpus_pipeline_composes_stage_semantics(spark, docs):
    """The composed pipeline's survivor set must equal the conjunction
    of its stages computed independently, the eval set must never
    train, and the packing must tile the SURVIVOR stream."""
    from opentelemetry_collector_spark.operators import dedup
    from opentelemetry_collector_spark.plans import corpus_pipeline as cpl

    rates = {f"src{i}": 500_000 for i in range(20)}
    out = cpl.corpus_pipeline(docs, rates, budget_tokens=128).collect()
    got_ids = {r["doc_id"] for r in out}
    # independently recompute: pre-filters first, then dedup reps
    # AMONG the pre-survivors (staged semantics — a cluster whose
    # min-id member was filtered keeps its best remaining member)
    quality = {r["doc_id"] for r in corpus.quality_rules(docs).filter("keep").collect()}
    contam = {r["doc_id"] for r in corpus.contamination(docs).collect()}
    sampled = {r["doc_id"] for r in corpus.mix_sample(docs, rates).collect()}
    bench = {r["doc_id"] for r in docs.collect() if r["doc_id"] % 97 == 0}
    pre_ids = (quality & sampled) - contam - bench
    pre = docs.filter(F.col("doc_id").isin(list(pre_ids)))
    pairs = dedup.neardup_pairs_minhash(pre, threshold=0.5)
    reps = {
        r["doc_id"]
        for r in dedup.neardup_components(pre, pairs).collect()
        if r["doc_id"] == r["component_id"]
    }
    want = pre_ids & reps
    assert got_ids == want and got_ids
    # packing tiles the survivor stream exactly
    pos = 0
    for r in sorted(out, key=lambda r: r["doc_id"]):
        assert r["chunk_id"] == pos // 128 and r["offset_in_chunk"] == pos % 128
        pos += r["n_tokens"]


def test_corpus_pipeline_precomputed_labels_identical(spark, docs):
    """The precomputed-labels stage input (r4 verdict: amortize the
    per-invocation label-propagation actions) must produce the exact
    inline result, and persist_handle must surface every cached frame
    for deterministic unpersist (r4 advice: clean_corpus leaked
    `pre`)."""
    from opentelemetry_collector_spark.plans import corpus_pipeline as cpl

    rates = {f"src{i}": 500_000 for i in range(20)}
    inline = cpl.corpus_pipeline(docs, rates, budget_tokens=128).collect()
    handle: list = []
    labels = cpl.component_labels(docs, rates, persist_handle=handle)
    assert handle  # pre + pairs intermediates surfaced
    with_labels = cpl.corpus_pipeline(
        docs, rates, budget_tokens=128, labels=labels
    ).collect()
    assert sorted(map(tuple, with_labels)) == sorted(map(tuple, inline))
    for frame in handle:
        frame.unpersist()
