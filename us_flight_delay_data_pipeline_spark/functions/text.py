"""Text-analysis expressions for the [EXT] LLM-data-pipeline surface
(SURVEY.md §0, §7 step 7): token counting, quality scoring, language
ID, document fingerprinting, n-gram shingling.

All native Column expressions (split/regexp/aggregate/transform) — at
100 TB these run inside whole-stage codegen with zero Python in the
hot path. Designed for the ``documents`` testdata table
(``doc_id, text, lang, source, n_chars``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count", "word_tokens", "punct_ratio", "stopword_ratio",
    "quality_score", "lang_id_heuristic", "doc_fingerprint",
    "char_ngrams", "word_ngrams",
]

# Small English-ish stopword list; deterministic and oracle-expressible.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# BPE-ish tokenizer regex: runs of word chars OR single non-space
# non-word chars (approximates byte-pair pre-tokenization splits).
BPE_ISH_PATTERN = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def word_tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for empty
    text, never a [''] singleton)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(trimmed, r"\s+"))


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token count: ``whitespace`` split or ``bpe`` (regexp-based
    BPE-ish pre-tokenization)."""
    if mode == "whitespace":
        return F.size(word_tokens(text)).cast("bigint")
    if mode == "bpe":
        return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))).cast("bigint")
    raise ValueError(f"unknown token mode {mode!r}")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation (non-word,
    non-space)."""
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are (lowercase) stopwords."""
    toks = word_tokens(F.lower(text))
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    total = F.size(toks)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        stop.cast("double") / total.cast("double"))


def quality_score(text: Column) -> Column:
    """Heuristic document-quality score in [0,1]: rewards moderate
    length, penalizes punctuation density and stopword-free (unnatural)
    text. Deterministic; the exact formula is the contract.

    score = 0.4*min(1, n_tokens/64) + 0.3*(1-punct_ratio)
          + 0.3*min(1, 4*stopword_ratio)
    """
    n_tok = token_count(text).cast("double")
    len_term = F.least(F.lit(1.0), n_tok / F.lit(64.0))
    punct_term = F.lit(1.0) - punct_ratio(text)
    stop_term = F.least(F.lit(1.0), F.lit(4.0) * stopword_ratio(text))
    return F.lit(0.4) * len_term + F.lit(0.3) * punct_term + F.lit(0.3) * stop_term


# Character trigrams that are distinctive per language — a toy n-gram
# language-ID model (real pipelines load fastText/CLD3; the *shape* —
# score-per-language then argmax, all JVM-side — is what scales).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", " a ", " is"),
    "es": ("ción", " el ", " la ", "que", " de "),
    "de": ("sch", " der ", " und ", "ein", "ich"),
    "fr": (" le ", " la ", "eau", " est ", "ent "),
    "zh": ("的", "是", "了", "在", "我"),
}


def lang_id_heuristic(text: Column) -> Column:
    """N-gram-marker language ID → 2-letter code (``und`` when no
    marker hits). Greatest-score-wins with deterministic tie-break on
    language code order."""
    lowered = F.lower(text)
    scored = F.array(*[
        F.struct(
            sum((F.when(F.instr(lowered, m) > 0, F.lit(1)).otherwise(F.lit(0))
                 for m in markers), F.lit(0)).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(_LANG_MARKERS.items())
    ])
    best = F.array_max(scored)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """64-bit-ish deterministic document fingerprint: polynomial
    rolling hash over whitespace tokens, computed with
    ``aggregate`` entirely JVM-side.

    fp = fold(tokens, h=0: (h*31 + crc32(token)) mod 2^61-1)
    """
    mod = F.lit(2305843009213693951)  # 2^61 - 1, keeps the fold in long range
    return F.aggregate(
        word_tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, tok: ((acc * F.lit(31)) % mod + F.crc32(tok)) % mod,
    )


def _index_range(count: Column) -> Column:
    """[1..count], empty when count<=0 (sequence(1,0) would descend)."""
    return F.when(count >= 1, F.sequence(F.lit(1), count)) \
            .otherwise(F.array().cast("array<int>"))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Array of character n-grams (shingles) for MinHash/Jaccard.
    Uses sequence+transform — no Python, no explode needed."""
    s = F.lower(text)
    count = F.length(s) - F.lit(n - 1)
    return F.transform(_index_range(count), lambda i: F.substring(s, i, n))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Array of word n-grams joined by single spaces."""
    toks = word_tokens(F.lower(text))
    count = F.size(toks) - F.lit(n - 1)
    return F.transform(
        _index_range(count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
