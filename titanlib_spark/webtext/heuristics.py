"""Gopher/C4-style quality heuristics — pure Catalyst column expressions.

These are the webtext recast of the reference's range/metadata checks
(range_check: reference src/range_check.cpp:16-46; metadata_check:
src/metadata_check.cpp:5-26): every feature below is a JVM-side expression
(higher-order array functions, regexes) that whole-stage-codegen compiles —
no Python, no shuffle. The bounds check itself reuses the same
flag-if-outside-[min,max] semilattice as the reference.

Features (each as a Column factory over a text column):

* n_chars, n_words           — document size
* mean_word_length           — Gopher rule 3-10 band
* symbol_word_ratio          — '#' and '...' per word (Gopher)
* stopword_ratio             — fraction of normalized tokens in the
                               predicted language's stopword set
                               (language-conditional: the
                               range_check_climatology analogue)
* alpha_word_ratio           — fraction of tokens containing a letter
* dup_line_frac              — fraction of non-unique lines (the
                               intra-document duplicate_check analogue)
* dup_para_frac              — same over blank-line-separated paragraphs
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from titanlib_spark.webtext.lexicon import LANGS, STOPWORDS


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: str | Column = "text") -> Column:
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def clean_tokens(text: str | Column = "text") -> Column:
    """Lowercased alpha-only tokens (punctuation stripped, empties dropped)."""
    toks = tokens(text)
    norm = F.transform(toks, lambda t: F.regexp_replace(F.lower(t), "[^a-z]", ""))
    return F.filter(norm, lambda t: t != "")


def n_words(text: str | Column = "text") -> Column:
    return F.size(tokens(text))


def mean_word_length(text: str | Column = "text") -> Column:
    ct = clean_tokens(text)
    total = F.aggregate(ct, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(ct) > 0, total.cast("double") / F.size(ct))


def symbol_word_ratio(text: str | Column = "text") -> Column:
    t = _col(text)
    hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipses = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    nw = n_words(text)
    return F.when(nw > 0, (hashes + ellipses).cast("double") / nw)


def stopword_ratio(
    text: str | Column = "text", lang: str | Column = "pred_lang"
) -> Column:
    """Fraction of clean tokens in the per-language stopword set; the
    language acts as the climatology key (per-lang expected band)."""
    ct = clean_tokens(text)
    lc = _col(lang)
    stops = F.array().cast("array<string>")
    for lg in LANGS:
        stops = F.when(lc == lg, F.array(*[F.lit(w) for w in STOPWORDS[lg]])).otherwise(
            stops
        )
    # unknown lang -> score against English (conservative)
    stops = F.when(
        lc.isin(*LANGS), stops
    ).otherwise(F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    hits = F.size(F.filter(ct, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(ct) > 0, hits.cast("double") / F.size(ct))


def alpha_word_ratio(text: str | Column = "text") -> Column:
    toks = tokens(text)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    return F.when(F.size(toks) > 0, alpha.cast("double") / F.size(toks))


def _dup_frac(parts: Column) -> Column:
    return F.when(
        F.size(parts) > 0,
        1.0 - F.size(F.array_distinct(parts)).cast("double") / F.size(parts),
    )


def dup_line_frac(text: str | Column = "text") -> Column:
    return _dup_frac(F.split(_col(text), "\n"))


def dup_para_frac(text: str | Column = "text") -> Column:
    return _dup_frac(F.split(_col(text), "\n\n"))


def is_empty_text(text: str | Column = "text") -> Column:
    t = _col(text)
    return t.isNull() | (F.length(F.trim(t)) == 0)


def with_quality_features(df: DataFrame, text_col: str = "text",
                          lang_col: str = "pred_lang") -> DataFrame:
    """Attach the full feature set in one projection (single codegen stage)."""
    return df.withColumns(
        {
            "n_chars": F.length(F.coalesce(_col(text_col), F.lit(""))),
            "n_words": n_words(text_col),
            "mean_word_length": mean_word_length(text_col),
            "symbol_word_ratio": symbol_word_ratio(text_col),
            "stopword_ratio": stopword_ratio(text_col, lang_col),
            "alpha_word_ratio": alpha_word_ratio(text_col),
            "dup_line_frac": dup_line_frac(text_col),
            "dup_para_frac": dup_para_frac(text_col),
        }
    )
