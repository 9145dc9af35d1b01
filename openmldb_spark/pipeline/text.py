"""Text analysis for training-data curation — pure Catalyst expressions.

Language-ID (stopword/charset heuristic), quality scoring, token counting
(whitespace + BPE-ish word-piece regex), and document fingerprinting
(shingle rolling-hash min — Rabin-Karp style winnowing reduced to a
min-hash). No Python in the data path: every feature is a JVM expression,
so the scan stays inside whole-stage codegen and columns prune down to
``text`` at the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

_EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is",
                 "it", "that", "for", "on", "with", "as"]


def _tokens(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+"))


def token_count(text: str | Column = "text") -> Column:
    """Whitespace token count; empty/blank → 0."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(_tokens(c)).cast("long")


def wordpiece_count(text: str | Column = "text") -> Column:
    """BPE-ish sub-token estimate: word-initial pieces + continuation
    pieces every ~4 chars (a deterministic stand-in for a real BPE vocab,
    proportional to true token counts on ASCII text)."""
    c = F.col(text) if isinstance(text, str) else text
    words = _tokens(c)
    return F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            F.lit(1), F.ceil(F.length(w) / F.lit(4)).cast("long")),
    )


def char_class_counts(text: Column) -> dict[str, Column]:
    """Counts by character class, each a single regexp_replace+length."""
    def cnt(pattern: str) -> Column:
        return (F.length(text)
                - F.length(F.regexp_replace(text, pattern, ""))).cast("long")
    return {
        "n_alpha": cnt(r"[A-Za-z]"),
        "n_digit": cnt(r"[0-9]"),
        "n_punct": cnt(r"[.,!?;:'\"()\[\]{}-]"),
        "n_space": cnt(r"\s"),
        "n_nonascii": cnt(r"[^\x00-\x7F]"),
    }


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or _EN_STOPWORDS
    words = _tokens(F.lower(text))
    hits = F.size(F.filter(words, lambda w: w.isin(sw)))
    n = F.size(words)
    return F.when(n > 0, hits.cast("double") / n.cast("double")) \
            .otherwise(F.lit(0.0))


def lang_guess(text: Column) -> Column:
    """Heuristic language ID: non-ASCII-heavy → 'other'; else the language
    whose stopword markers hit most often; fallback 'unknown'."""
    lowered = _tokens(F.lower(text))

    def marker_hits(markers: list[str]):
        return lambda w: w.isin(markers)

    scores = [
        (lang, F.size(F.filter(lowered, marker_hits(markers))))
        for lang, markers in _LANG_MARKERS.items()
    ]
    nonascii = (F.length(text)
                - F.length(F.regexp_replace(text, r"[^\x00-\x7F]", "")))
    best = None
    for lang, s in scores:
        cand = F.struct(s.alias("s"), F.lit(lang).alias("l"))
        best = cand if best is None else F.when(
            cand.getField("s") > best.getField("s"), cand).otherwise(best)
    return (F.when(nonascii * 3 > F.length(text), F.lit("other"))
            .when(best.getField("s") > 0, best.getField("l"))
            .otherwise(F.lit("unknown")))


def quality_score(text: Column) -> Column:
    """[0,1] doc-quality heuristic: length sweet-spot, word length
    plausibility, punctuation moderation, stopword presence. Deterministic,
    monotone in each component."""
    n = F.length(text).cast("double")
    toks = token_count(text).cast("double")
    cc = char_class_counts(text)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    awl = F.when(toks > 0, (cc["n_alpha"].cast("double") / toks)) \
           .otherwise(F.lit(0.0))
    awl_score = F.when((awl >= 3) & (awl <= 10), F.lit(1.0)) \
                 .otherwise(F.lit(0.5))
    punct_ratio = F.when(n > 0, cc["n_punct"].cast("double") / n) \
                   .otherwise(F.lit(0.0))
    punct_score = F.when(punct_ratio < 0.1, F.lit(1.0)).otherwise(F.lit(0.5))
    sw_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return ((len_score + awl_score + punct_score + sw_score) / 4.0)


def fingerprint(text: Column, shingle: int = 8) -> Column:
    """Rolling-hash document fingerprint: min of xxhash64 over all
    ``shingle``-char substrings of the lowercased text (winnowing with a
    single global window — robust to local edits, cheap at scale).
    Short texts hash whole."""
    t = F.lower(text)
    n = F.length(t)
    shingles = F.when(
        n >= shingle,
        F.transform(F.sequence(F.lit(1), n - shingle + 1),
                    lambda i: F.substring(t, i, shingle))
    ).otherwise(F.array(t))
    return F.array_min(F.transform(shingles, lambda s: F.xxhash64(s)))


def text_features(df: DataFrame, text_col: str = "text",
                  prefix: str = "") -> DataFrame:
    """Append the full text-analysis feature set as columns."""
    t = F.col(text_col)
    cc = char_class_counts(t)
    feats = {
        "n_chars": F.length(t).cast("long"),
        "n_tokens": token_count(t),
        "n_wordpieces": wordpiece_count(t),
        **cc,
        "stopword_ratio": stopword_ratio(t),
        "lang_guess": lang_guess(t),
        "quality_score": quality_score(t),
        "fingerprint": fingerprint(t),
    }
    out = df
    for name, c in feats.items():
        out = out.withColumn(prefix + name, c)
    return out
