"""BPE tokenizer training + segmentation over the documents corpus.

Tokenizer training is the canonical ITERATIVE corpus algorithm a
training-data pipeline runs (the other operator families here are
single-pass): k rounds of (adjacent-pair count → argmax → merge).
Spark-first decomposition:

- the CORPUS-scale work happens once: one word-frequency aggregate
  (explode + map-side-combined hash agg — the same shape as
  vocab_topk). At 100 TB this is the only pass over the text;
- every training round then runs on the DISTINCT-WORD table (vocab-
  sized, persisted — ~10^6 rows at web scale, executor-light), as
  pure Catalyst expressions; only the single argmax row is collected
  per round (bounded driver traffic, the IVF-fit precedent);
- ties break lexicographically so training is deterministic across
  cluster sizes and engines.

Convention (documented simplification vs reference BPE): words are
whitespace tokens of the normalized text with an end-of-word marker;
each merge rule is applied as ONE left-to-right all-occurrences pass,
in rank order, both during training and during segmentation. This
keeps every step expressible as an engine-portable string replace —
`bpe_segment` has an exact DuckDB oracle (the same replace chain),
and training is pinned against a pure-Python reference implementation
in tests (iterative argmax is not SQL-expressible, so the driver's
check for `bpe_merges` is rows-only; the pytest carries the value
check).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.text import (
    normalize_text,
    spread_to_parallelism,
)

# Non-NUL control characters: they must survive inside SQL string
# literals (a raw NUL would truncate/parse-fail), and they cannot
# appear in normalized corpus text short of control-char-bearing
# inputs (which would mis-segment only their own word)
SEP = "\x1e"  # symbol separator inside a word's working string
EOW = "\x17"  # end-of-word marker symbol (fused to the last char)
DEFAULT_NUM_MERGES = 32


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized corpus — THE corpus-scale pass."""
    words = F.split(F.coalesce(normalize_text(F.col(text_col)), F.lit("")), " ")
    return (
        spread_to_parallelism(df).select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_syms(word: Column) -> Column:
    """'abc' → 'a{SEP}b{SEP}c{EOW}': characters joined by SEP with the
    end-of-word marker fused to the final character."""
    chars = F.split(word, "")
    return F.concat(F.array_join(chars, SEP), F.lit(EOW))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency. A pair
    occurring twice in one word counts twice (standard BPE counting:
    per-occurrence, one left-to-right pass)."""
    # stage the split as ITS OWN projection: element_at inside the
    # lambda would otherwise re-run the regex split per element (the
    # documented inline-lambda trap) — O(s²) splits per word
    staged = vocab.select(F.split(F.col("syms"), SEP).alias("_syms"), "freq")
    syms = F.col("_syms")
    # guard single-symbol words: sequence(1, 0) is DESCENDING in Spark
    # ([1, 0]), which would index element_at out of bounds
    idx = F.when(
        F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pair = F.explode(
        F.transform(
            idx,
            lambda i: F.concat(
                F.element_at(syms, i), F.lit(SEP), F.element_at(syms, i + 1)
            ),
        )
    )
    return (
        staged.select(pair.alias("pair"), F.col("freq"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def bpe_train(
    df: DataFrame,
    num_merges: int = DEFAULT_NUM_MERGES,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Train `num_merges` BPE merges; returns [(left, right), ...] in
    rank order. Stops early when the best pair drops under min_count."""
    vocab = word_freqs(df, text_col).select(
        _initial_syms(F.col("word")).alias("syms"), "freq"
    ).persist()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            best = (
                _pair_counts(vocab)
                .orderBy(F.col("n").desc(), F.col("pair"))
                .first()
            )
            if best is None or best["n"] < min_count:
                break
            left, right = best["pair"].split(SEP)
            merges.append((left, right))
            new_vocab = vocab.select(
                F.replace(
                    F.col("syms"),
                    F.lit(left + SEP + right),
                    F.lit(left + right),
                ).alias("syms"),
                "freq",
            ).persist()
            # materialize BEFORE dropping the old cache — persist() is
            # lazy, and unpersisting first would force every later
            # round to rebuild from the raw corpus (k corpus passes
            # instead of the documented one)
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return merges


def segment_expr(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Token array for each document under the trained merges: chars →
    rank-ordered replace chain → split on SEP. The EOW marker stays
    fused to its token (stripped for display)."""
    words = F.split(F.coalesce(normalize_text(text), F.lit("")), " ")
    def seg_word(w: Column) -> Column:
        s = F.concat(F.array_join(F.split(w, ""), SEP), F.lit(EOW))
        for left, right in merges:
            s = F.replace(s, F.lit(left + SEP + right), F.lit(left + right))
        return F.split(F.replace(s, F.lit(EOW), F.lit("")), SEP)

    return F.flatten(F.transform(F.filter(words, lambda w: w != ""), seg_word))


def oracle_segment(merges: list[tuple[str, str]], col: str = "text") -> str:
    """DuckDB mirror of segment_expr — the identical replace chain over
    the identical char join, applied per word."""
    norm = rf"coalesce(trim(regexp_replace(lower({col}), '\s+', ' ', 'g')), '')"

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    s = f"array_to_string(string_split(w, ''), {q(SEP)}) || {q(EOW)}"
    for left, right in merges:
        s = f"replace({s}, {q(left + SEP + right)}, {q(left + right)})"
    inner = f"string_split(replace({s}, {q(EOW)}, ''), {q(SEP)})"
    return (
        f"flatten(list_transform(list_filter(string_split({norm}, ' '), "
        f"w -> w <> ''), w -> {inner}))"
    )


def reference_bpe(
    texts: list[str], num_merges: int = DEFAULT_NUM_MERGES, min_count: int = 2
) -> list[tuple[str, str]]:
    """Pure-Python reference implementation of the SAME convention
    (per-occurrence counting, lexicographic tie-break, one left-to-
    right replace pass per merge) — the training pin for bpe_train."""
    import re

    freqs: Counter[str] = Counter()
    java_ws = re.compile("[ \t\n\x0b\f\r]+")  # Java \s, NOT python
    # str.split() (which also eats NBSP/U+2000… — a latent divergence
    # from normalize_text's regex on unicode-whitespace corpora)
    for t in texts:
        # strip(' ') not strip(): Spark's trim removes SPACES only,
        # python's default strip also eats NBSP/unicode whitespace
        norm = java_ws.sub(" ", (t or "").lower()).strip(" ")
        for w in norm.split(" "):
            if w:
                freqs[w] += 1
    # SEP.join(chars) + EOW fuses the marker to the final char exactly
    # like _initial_syms (no separator before the marker)
    vocab: Counter[str] = Counter()
    for w, f in freqs.items():
        vocab[SEP.join(list(w)) + EOW] += f
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: Counter[tuple[str, str]] = Counter()
        for syms, f in vocab.items():
            parts = syms.split(SEP)
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # mirror orderBy(n desc, pair asc): max count, lexicographic
        # ASC tie-break on the SEP-joined pair string
        top_n = max(counts.values())
        if top_n < min_count:
            break
        pair = min(
            (SEP.join(p) for p, n in counts.items() if n == top_n)
        ).split(SEP)
        merges.append((pair[0], pair[1]))
        left, right = pair
        merged: Counter[str] = Counter()
        for syms, f in vocab.items():
            merged[syms.replace(left + SEP + right, left + right)] += f
        vocab = merged
    return merges
