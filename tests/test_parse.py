"""Parse stage: native vs arrow equality, quarantine, plan hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import parse


def _sorted_rows(df):
    cols = ["conv_id", "turn_idx", "level", "svc", "latency_ms", "req_id", "msg", "valid"]
    return df.select(cols).orderBy("conv_id", "turn_idx").collect()


def test_native_arrow_equivalence(transcripts):
    a = _sorted_rows(parse.with_parsed(transcripts, "native"))
    b = _sorted_rows(parse.with_parsed(transcripts, "arrow"))
    assert a == b


def test_malformed_quarantined(transcripts):
    parsed = parse.with_parsed(transcripts, "native")
    bad = parsed.filter(~F.col("valid"))
    n_bad = bad.count()
    assert n_bad > 0
    # all invalid rows are exactly the corrupt ones, with all-null attrs
    assert bad.filter(~F.col("text").startswith("!!corrupt")).count() == 0
    assert bad.filter(F.col("latency_ms").isNotNull()).count() == 0


def test_parsed_fields_roundtrip(transcripts):
    """req_id embeds the unique ID — per-turn text-equality invariant."""
    parsed = parse.with_parsed(transcripts, "native").filter(F.col("valid"))
    mismatch = parsed.filter(
        F.col("req_id")
        != F.concat(F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"))
    )
    assert mismatch.count() == 0


def test_native_plan_has_no_python(transcripts):
    """SURVEY.md §7: no per-row Python; native path has no Python eval at all."""
    plan = parse.with_parsed(transcripts, "native")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_arrow_plan_is_vectorized(transcripts):
    plan = parse.with_parsed(transcripts, "arrow")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python
    assert "ArrowEvalPython" in plan


def test_vocab_and_tfidf_semantics(spark):
    """Hand-computed vocabulary + integer TF-IDF on a 3-doc corpus."""
    from opentelemetry_collector_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "apple cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    vocab = {r["term"]: (r["n_total"], r["n_docs"]) for r in T.corpus_vocab(docs).collect()}
    assert vocab == {
        "apple": (3, 2),
        "banana": (2, 2),
        "cherry": (3, 2),
        "durian": (1, 1),
    }
    top = T.vocab_topk(docs, k=2).collect()
    assert [(r["term"]) for r in top] == ["apple", "cherry"]  # tie → term asc
    tfidf = {
        (r["doc_id"], r["rnk"]): (r["term"], r["score_ppm"])
        for r in T.tfidf_topterms(docs, k=2).collect()
    }
    # doc 0: apple tf=2 len=3 df=2 N=3 → floor(2e6·3/(3·2)) = 1000000
    assert tfidf[(0, 1)] == ("apple", 1_000_000)
    # doc 0: banana tf=1 → floor(1e6·3/(3·2)) = 500000
    assert tfidf[(0, 2)] == ("banana", 500_000)
    # doc 2: cherry (tf=2,df=2) and durian (tf=1,df=1) both score
    # floor(750000); the deterministic tie-break is term asc
    assert tfidf[(2, 1)] == ("cherry", 750_000)
    assert tfidf[(2, 2)] == ("durian", 750_000)


def test_repetition_signals_semantics(spark):
    from opentelemetry_collector_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),          # bigrams: ab×3 ba×2 → top 3/5
            (1, "x y z w v u"),          # all distinct
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in T.repetition_signals(docs).collect()}
    assert rows[0]["top_bigram_ppm"] == 600_000
    # trigrams of doc0: aba bab aba bab → 4 total, 2 distinct → 500000
    assert rows[0]["dup_trigram_ppm"] == 500_000
    assert rows[1]["top_bigram_ppm"] == 200_000  # 1/5
    assert rows[1]["dup_trigram_ppm"] == 0


def test_redact_pii_masks_and_counts(spark):
    from opentelemetry_collector_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (0, "mail bob@x.co or call +1 (555) 123-4567 ref 123456789"),
            (1, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in T.redact_pii(docs).collect()}
    assert rows[0]["redacted"] == "mail <email> or call <phone> ref <idnum>"
    assert (rows[0]["n_email"], rows[0]["n_idnum"], rows[0]["n_phone"]) == (1, 1, 1)
    assert rows[1]["redacted"] == "clean text with no pii at all"
    assert (rows[1]["n_email"], rows[1]["n_idnum"], rows[1]["n_phone"]) == (0, 0, 0)


def test_lm_score_semantics(spark):
    """Common-phrase docs outscore word salad; hand-checked ppm."""
    from opentelemetry_collector_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (0, "a b c"),   # bigrams: ab, bc
            (1, "a b d"),   # bigrams: ab, bd
        ],
        "doc_id long, text string",
    )
    # corpus bigrams: ab×2, bc×1, bd×1 → total 4
    # freq_ppm: ab=500000, bc=250000, bd=250000
    rows = {r["doc_id"]: r for r in T.lm_score(docs).collect()}
    assert rows[0]["lm_score_ppm"] == (500_000 + 250_000) // 2
    assert rows[0]["n_bigrams"] == 2
    assert rows[1]["lm_score_ppm"] == (500_000 + 250_000) // 2
