"""Text-analysis functions for training-data pipelines over `documents`.

All are pure Catalyst expressions (JVM-side, engine-portable SQL
semantics shared with the DuckDB oracle): tokenization, token counts,
stopword-based language ID, quality scoring, document fingerprinting.
These extend the engine beyond the reference's scope (the reference has
no text analytics) — they are the "training-data pipeline" operator set
this engine adds as first-class components.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword sets for the language-ID heuristic
STOP_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")
STOP_ES = ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los")
STOP_FR = ("le", "la", "de", "et", "un", "que", "pour", "dans", "est", "les")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of the trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count word pieces + digits + punctuation runs.

    regexp-based segmentation (letters runs, digit runs, single
    punctuation) — the standard cheap stand-in for a real tokenizer.
    """
    pieces = F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
    )
    return F.size(pieces).cast("long")


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def stopword_ratio(text: Column, words: tuple[str, ...] = STOP_EN) -> Column:
    toks = tokens(text)
    return F.round(_hits(toks, words) / F.greatest(F.size(toks), F.lit(1)), 6)


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID: en/es/fr, else 'und'."""
    toks = tokens(text)
    en, es, fr = _hits(toks, STOP_EN), _hits(toks, STOP_ES), _hits(toks, STOP_FR)
    return (
        F.when((en >= es) & (en >= fr) & (en > 0), F.lit("en"))
        .when((es > en) & (es >= fr), F.lit("es"))
        .when((fr > en) & (fr > es), F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def alpha_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^A-Za-z]", "")
    return F.round(
        F.length(stripped) / F.greatest(F.length(text), F.lit(1)), 6
    )


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality score: length + stopword + alpha mix."""
    len_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.3) * len_term
        + F.lit(0.4) * stopword_ratio(text)
        + F.lit(0.3) * alpha_ratio(text),
        6,
    )


def quality_score_ppm(text: Column) -> Column:
    """quality_score in exact parts-per-million integer arithmetic.

    0.3·min(L,500)/500 + 0.4·H/N + 0.3·A/L, scaled ×1e6 with integer
    floor division — bit-identical across engines (double `round()`
    tie-breaking differs between Spark's BigDecimal HALF_UP on the
    shortest decimal repr and DuckDB's C-library rounding, so any
    cross-engine score must avoid float rounding entirely).
    """
    toks = tokens(text)
    L = F.length(text).cast("long")
    N = F.greatest(F.size(toks), F.lit(1)).cast("long")
    H = _hits(toks, STOP_EN).cast("long")
    A = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("long")
    len_term = F.least(L, F.lit(500)) * 600  # 300000 * min(L,500) / 500
    stop_term = (H * 400000) / N
    alpha_term = (A * 300000) / F.greatest(L, F.lit(1))
    return (len_term + F.floor(stop_term) + F.floor(alpha_term)).cast("long")


def normalize_text(text: Column) -> Column:
    """Canonical form for near-dup work: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def word_grams(text: Column, n: int) -> Column:
    """Word n-grams of the normalized text (WITH duplicates — near-dup
    shingles wrap this in array_distinct). NULL text ≡ '' (Spark
    concat_ws silently maps NULL→'' where DuckDB array_to_string keeps
    NULL — the coalesce keeps both engines on the '' branch). The ONE
    definition shared by shingling, winnowing inputs and the
    repetition signals; its SQL twin is oracle_word_grams."""
    words = F.split(F.coalesce(normalize_text(text), F.lit("")), " ")
    k = F.size(words) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def oracle_word_grams(col: str, n: int) -> str:
    norm = rf"coalesce(trim(regexp_replace(lower({col}), '\s+', ' ', 'g')), '')"
    words = f"string_split({norm}, ' ')"
    return (
        f"CASE WHEN len({words}) >= {n} THEN "
        f"list_transform(range(1, len({words}) - {n - 2}), "
        f"i -> array_to_string({words}[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({words}, ' ')] END"
    )


def fingerprint(text: Column) -> Column:
    """Stable document fingerprint: md5 of the normalized text.

    md5 (not xxhash64) so the DuckDB oracle computes the identical
    value — engine-portable hashing is a design constraint for every
    dedup primitive here.
    """
    return F.md5(normalize_text(text))


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Repartition to the session's parallelism before CPU-dense
    per-row stages (exploded grams, minhash/simhash fingerprints):
    single-row-group parquet inputs scan as ONE task, which serializes
    the work — measured 7.5× on the sf0.1 documents table and 2-task
    stages for the corpus text operators on a 32-core box.

    Unconditional: peeking at df.rdd.getNumPartitions() forces an RDD
    plan conversion on the driver per call, which costs more than the
    (cheap, pre-hash, narrow-row) round-robin shuffle it avoids. The
    ONE copy of this tuning rule — operators/dedup imports it too."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


_spread = spread_to_parallelism


def corpus_vocab(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary: term → (total occurrences, document
    frequency) over normalized whitespace tokens.

    Scale shape: explode → ONE hash aggregate keyed by term with
    map-side partial combine (occurrences), plus an exact distinct-doc
    count per term riding the same exchange — the canonical
    vocab-build; the result is vocab-sized, orders smaller than the
    corpus."""
    ex = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    )
    return ex.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_distinct("id").alias("n_docs"),
    )


def vocab_topk(
    df: DataFrame, k: int = 100, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k corpus terms by occurrence (bigint-deterministic ordering,
    ties broken by term)."""
    return (
        corpus_vocab(df, id_col, text_col)
        .orderBy(F.col("n_total").desc(), "term")
        .limit(k)
    )


def tfidf_topterms(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document top-k terms by an exact-arithmetic TF-IDF variant:

        score_ppm = floor(tf · 10⁶ · N / (len_d · df))

    — raw inverse document frequency (no log), so every input is an
    exact integer ≤ 2^53 and the single double division + floor is
    bit-identical across engines (the float-log formulation would hit
    the cross-engine round() tie problem).

    Scale: explode → (doc, term) hash agg → term-keyed df join (the
    term-frequency side is vocab-sized — broadcastable when the vocab
    is bounded) → per-doc window over ≤ |doc vocab| rows. N arrives by
    broadcasting a one-row aggregate, not a driver collect."""
    from pyspark.sql import Window

    ex = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    )
    tf = ex.groupBy("id", "term").agg(F.count(F.lit(1)).alias("n_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dlen = ex.groupBy("id").agg(F.count(F.lit(1)).alias("len_d"))
    ndocs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(dlen, "id")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score_ppm",
            F.floor(
                F.col("n_tf").cast("double")
                * F.lit(1000000.0)
                * F.col("n_docs")
                / (F.col("len_d") * F.col("df"))
            ).cast("long"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score_ppm").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(F.col("id").alias(id_col), "term", "score_ppm", "rnk")
    )


# ------------------------------------------------------------- oracle SQL

def oracle_tokens(col: str = "text") -> str:
    return f"regexp_split_to_array(trim({col}), '\\s+')"


def oracle_token_count(col: str = "text") -> str:
    return f"cast(len({oracle_tokens(col)}) AS bigint)"


def _oracle_hits(col: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter({oracle_tokens(col)}, "
        f"t -> list_contains([{lst}], lower(t))))"
    )


def oracle_stopword_ratio(col: str = "text") -> str:
    # 1e0 literals force double arithmetic (DuckDB would otherwise use
    # DECIMAL and round differently from Spark's double math)
    return (
        f"round({_oracle_hits(col, STOP_EN)} * 1.0e0 / "
        f"greatest(len({oracle_tokens(col)}), 1), 6)"
    )


def oracle_lang_id(col: str = "text") -> str:
    en, es, fr = (
        _oracle_hits(col, STOP_EN),
        _oracle_hits(col, STOP_ES),
        _oracle_hits(col, STOP_FR),
    )
    return (
        f"CASE WHEN {en} >= {es} AND {en} >= {fr} AND {en} > 0 THEN 'en' "
        f"WHEN {es} > {en} AND {es} >= {fr} THEN 'es' "
        f"WHEN {fr} > {en} AND {fr} > {es} THEN 'fr' ELSE 'und' END"
    )


def oracle_alpha_ratio(col: str = "text") -> str:
    return (
        f"round(length(regexp_replace({col}, '[^A-Za-z]', '', 'g')) * 1.0e0 / "
        f"greatest(length({col}), 1), 6)"
    )


def oracle_quality_score(col: str = "text") -> str:
    return (
        f"round(0.3e0 * least(length({col}) / 500.0e0, 1.0e0) "
        f"+ 0.4e0 * {oracle_stopword_ratio(col)} "
        f"+ 0.3e0 * {oracle_alpha_ratio(col)}, 6)"
    )


def oracle_quality_score_ppm(col: str = "text") -> str:
    """Exact-integer mirror of quality_score_ppm (same double divisions
    + floor in both engines → bit-identical)."""
    toks = oracle_tokens(col)
    n = f"greatest(len({toks}), 1)"
    h = _oracle_hits(col, STOP_EN)
    a = f"length(regexp_replace({col}, '[^A-Za-z]', '', 'g'))"
    return (
        f"cast(least(length({col}), 500) * 600 "
        f"+ floor(({h} * 400000) / {n}) "
        f"+ floor(({a} * 300000) / greatest(length({col}), 1)) AS bigint)"
    )


def oracle_fingerprint(col: str = "text") -> str:
    return f"md5(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')))"


def _oracle_norm_terms_cte(table: str = "documents") -> str:
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"""
        nrm AS (SELECT doc_id, {norm} AS norm FROM {table}),
        ex AS (SELECT doc_id AS id, unnest(string_split(norm, ' ')) AS term
               FROM nrm)"""


def oracle_vocab_topk(k: int = 100, table: str = "documents") -> str:
    return f"""
        WITH {_oracle_norm_terms_cte(table)}
        SELECT term, cast(count(*) AS bigint) AS n_total,
               cast(count(DISTINCT id) AS bigint) AS n_docs
        FROM ex GROUP BY 1
        ORDER BY n_total DESC, term LIMIT {k}"""


def oracle_tfidf_topterms(k: int = 3, table: str = "documents") -> str:
    """Mirror of tfidf_topterms: identical multiply order (left-assoc,
    exact integers into ONE double division) + floor."""
    return f"""
        WITH {_oracle_norm_terms_cte(table)},
        tf AS (SELECT id, term, count(*) AS n_tf FROM ex GROUP BY 1, 2),
        dfq AS (SELECT term, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
        dlen AS (SELECT id, count(*) AS len_d FROM ex GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM {table}),
        scored AS (
            SELECT tf.id, tf.term,
                   cast(floor(tf.n_tf * 1000000.0e0 * n.n_docs
                              / (dlen.len_d * dfq.df)) AS bigint) AS score_ppm
            FROM tf
            JOIN dfq USING (term)
            JOIN dlen USING (id)
            CROSS JOIN n)
        SELECT id AS doc_id, term, score_ppm,
               cast(row_number() OVER (PARTITION BY id
                    ORDER BY score_ppm DESC, term) AS int) AS rnk
        FROM scored QUALIFY rnk <= {k}"""


# ----------------------------------------------- repetition quality rules
#
# Gopher/C4-style repetition signals: heavily repeated n-grams are the
# classic low-quality marker. Exact integer ppm (floor of a single
# double division of exact ints — the cross-engine-safe arithmetic this
# module standardizes on).


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition metrics over normalized word n-grams:

      top_bigram_ppm:  count(most frequent 2-gram) · 10⁶ / total 2-grams
      dup_trigram_ppm: (total − distinct 3-grams) · 10⁶ / total 3-grams

    Scale: one explode per n-gram order → (doc, gram) hash agg with
    map-side combine → per-doc max/sum. No windows over the corpus, no
    joins except the final per-doc merge of two doc-keyed aggregates.
    """
    def grams(n: int) -> Column:
        return word_grams(F.col(text_col), n)

    df = _spread(df)
    bi = df.select(F.col(id_col).alias("id"), F.explode(grams(2)).alias("g"))
    bi_counts = bi.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    bi_doc = bi_counts.groupBy("id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_bi")
    )
    tri = df.select(F.col(id_col).alias("id"), F.explode(grams(3)).alias("g"))
    tri_doc = tri.groupBy("id").agg(
        F.count(F.lit(1)).alias("total_tri"),
        F.count_distinct("g").alias("distinct_tri"),
    )
    ppm = lambda num, den: F.floor(  # noqa: E731
        num.cast("double") * F.lit(1000000.0) / den
    ).cast("long")
    return (
        bi_doc.join(tri_doc, "id")
        .select(
            F.col("id").alias(id_col),
            ppm(F.col("top_c"), F.col("total_bi")).alias("top_bigram_ppm"),
            ppm(
                F.col("total_tri") - F.col("distinct_tri"), F.col("total_tri")
            ).alias("dup_trigram_ppm"),
        )
    )


def oracle_repetition_signals(table: str = "documents", extra_cte: str = "") -> str:
    """SQL twin of repetition_signals — grams via the ONE shared
    oracle_word_grams builder (NULL-coalesced, matching the Spark
    side); extra_cte lets callers prepend an input-table CTE."""
    def grams(n: int) -> str:
        return oracle_word_grams("text", n)

    lead = f"{extra_cte}," if extra_cte else ""
    return f"""
        WITH {lead} bi AS (SELECT doc_id AS id, unnest({grams(2)}) AS g FROM {table}),
        bic AS (SELECT id, g, count(*) AS c FROM bi GROUP BY 1, 2),
        bid AS (SELECT id, max(c) AS top_c, sum(c) AS total_bi FROM bic GROUP BY 1),
        tri AS (SELECT doc_id AS id, unnest({grams(3)}) AS g FROM {table}),
        trid AS (SELECT id, count(*) AS total_tri,
                        count(DISTINCT g) AS distinct_tri
                 FROM tri GROUP BY 1)
        SELECT bid.id AS doc_id,
               cast(floor(top_c * 1000000.0e0 / total_bi) AS bigint)
                 AS top_bigram_ppm,
               cast(floor((total_tri - distinct_tri) * 1000000.0e0 / total_tri)
                 AS bigint) AS dup_trigram_ppm
        FROM bid JOIN trid USING (id)"""


# ------------------------------------------------------------ PII redaction

# deliberately simple, engine-portable patterns (Java regex and RE2
# agree on this subset — no backrefs, no lookaround)
# order matters and is part of the operator contract (mirrored in the
# oracle): email first (so usernames' digits survive as one token),
# then pure long digit runs (ids), then phone-ish runs — phone's
# separator class would otherwise swallow every 9+-digit id
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("idnum", r"[0-9]{9,}"),
    # explicit whitespace chars: Java's \s includes \x0b, RE2's does
    # not — a \s here would silently diverge from the DuckDB oracle
    ("phone", r"\+?[0-9][0-9()\- \t\n\r\f]{7,}[0-9]"),
)


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mask emails / phone-ish runs / long id numbers with typed
    placeholders; report per-type hit counts. Pure Catalyst
    regexp_replace/regexp_extract_all — order matters (email first so
    its digits aren't half-eaten by the number rule), mirrored exactly
    in the oracle."""
    out = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(out, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        out = F.regexp_replace(out, pat, f"<{name}>")
    return df.select(F.col(id_col), out.alias("redacted"), *counts)


def oracle_redact_pii(table: str = "documents") -> str:
    out = "text"
    cols = []
    for name, pat in PII_PATTERNS:
        # DuckDB standard string literals take backslashes literally —
        # only quotes need escaping (doubling backslashes would corrupt
        # the regex)
        esc = pat.replace("'", "''")
        cols.append(
            f"cast(len(regexp_extract_all({out}, '{esc}')) AS bigint) AS n_{name}"
        )
        out = f"regexp_replace({out}, '{esc}', '<{name}>', 'g')"
    return f"""
        SELECT doc_id, {out} AS redacted, {", ".join(cols)}
        FROM {table}"""


# ------------------------------------------------- corpus LM-score proxy


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_handle: list | None = None,
) -> DataFrame:
    """Corpus-informed fluency proxy (the n-gram-LM stand-in used by
    training-data pipelines when a real LM is too expensive): each
    document scores the MEAN corpus frequency of its bigrams,

        bigram_freq_ppm = floor(count(g) · 10⁶ / total_bigrams)
        lm_score_ppm    = floor(Σ bigram_freq_ppm / n_bigrams_doc)

    Common-phrase documents score high, word-salad scores low. All
    exact integers + floored double divisions (engine-bit-identical);
    nested floors are mirrored in the oracle.

    Scale: ONE corpus bigram-count aggregate (vocab²-bounded, in
    practice Zipf-small) joined back to the exploded docs on the bigram
    key — broadcastable when the bigram table is bounded — then a
    per-doc mean. No corpus-wide windows.

    The exploded (id, gram) frame feeds THREE consumers (count agg,
    total agg, join-back), so it is persisted — without the cache the
    normalize/split/concat gram construction runs three times
    (measured ~2× wall on the sf0.1 corpus). Pass ``persist_handle=[]``
    to unpersist deterministically (the family contract of every
    persisting operator here); otherwise the ContextCleaner reclaims it
    on GC and long-lived sessions should clearCache between queries
    (bench.py / check_correctness.py both do)."""
    ex = _spread(df).select(
        F.col(id_col).alias("id"), F.explode(word_grams(F.col(text_col), 2)).alias("g")
    ).persist()
    if persist_handle is not None:
        persist_handle.append(ex)
    counts = ex.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    total = ex.agg(F.count(F.lit(1)).alias("total_bi"))
    freq = counts.crossJoin(F.broadcast(total)).select(
        "g",
        F.floor(F.col("c").cast("double") * F.lit(1000000.0) / F.col("total_bi"))
        .cast("long")
        .alias("freq_ppm"),
    )
    return (
        ex.join(freq, "g")
        .groupBy("id")
        .agg(
            F.floor(
                F.sum("freq_ppm").cast("double") / F.count(F.lit(1))
            ).cast("long").alias("lm_score_ppm"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .select(F.col("id").alias(id_col), "lm_score_ppm", "n_bigrams")
    )


def oracle_lm_score(table: str = "documents", extra_cte: str = "") -> str:
    lead = f"{extra_cte}," if extra_cte else ""
    return f"""
        WITH {lead} ex AS (SELECT doc_id AS id, unnest({oracle_word_grams("text", 2)}) AS g
                   FROM {table}),
        counts AS (SELECT g, count(*) AS c FROM ex GROUP BY 1),
        tot AS (SELECT count(*) AS total_bi FROM ex),
        freq AS (SELECT g,
                        cast(floor(c * 1000000.0e0 / tot.total_bi) AS bigint)
                          AS freq_ppm
                 FROM counts CROSS JOIN tot)
        SELECT ex.id AS doc_id,
               cast(floor(sum(freq_ppm) * 1.0e0 / count(*)) AS bigint)
                 AS lm_score_ppm,
               cast(count(*) AS bigint) AS n_bigrams
        FROM ex JOIN freq USING (g)
        GROUP BY 1"""
