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


def fingerprint(text: Column) -> Column:
    """Stable document fingerprint: md5 of the normalized text.

    md5 (not xxhash64) so the DuckDB oracle computes the identical
    value — engine-portable hashing is a design constraint for every
    dedup primitive here.
    """
    return F.md5(normalize_text(text))


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
