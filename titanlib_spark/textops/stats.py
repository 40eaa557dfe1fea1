"""Text analysis: token counting, fingerprinting, quality scoring.

All pure Catalyst expressions (regex + higher-order array functions);
language-ID lives in titanlib_spark.webtext.langid (pandas-UDF stage) and
quality heuristics in titanlib_spark.webtext.heuristics — this module adds
the corpus-statistics surface a training-data pipeline reports on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from titanlib_spark.webtext import heuristics as H

# BPE-ish pre-tokenization (GPT-2-style): word pieces, numbers, punctuation
# runs, whitespace collapsed. A real BPE merges afterwards; the piece count
# is the standard cheap token-count proxy.
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count(text: str | Column = "text") -> Column:
    """Whitespace token count."""
    return H.n_words(text)


def bpe_ish_token_count(text: str | Column = "text") -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            F.regexp_extract_all(F.coalesce(t, F.lit("")), F.lit(_BPE_ISH), F.lit(0)),
            lambda s: s != "",
        )
    )


def fingerprint(text: str | Column = "text", normalize: bool = True) -> Column:
    """64-bit content fingerprint (rolling-hash style): xxhash64 of the
    whitespace-and-case-normalized text, so cosmetic reflows collide."""
    t = F.col(text) if isinstance(text, str) else text
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return F.xxhash64(t)


def quality_score(text: str | Column = "text", lang: str | Column | None = None) -> Column:
    """Composite [0,1] quality score: average of clamped sub-scores
    (length, stopword density, alpha density, line uniqueness). A cheap,
    monotone summary for ranking/sampling — the keep/drop decision itself
    uses the full rule set in webtext.pipeline."""
    lang = lang if lang is not None else F.lit("en")
    nw = H.n_words(text).cast("double")
    len_score = F.least(nw / 100.0, F.lit(1.0))
    stop_score = F.least(
        F.coalesce(H.stopword_ratio(text, lang), F.lit(0.0)) / 0.3, F.lit(1.0)
    )
    alpha_score = F.coalesce(H.alpha_word_ratio(text), F.lit(0.0))
    uniq_score = 1.0 - F.coalesce(H.dup_line_frac(text), F.lit(1.0))
    return (len_score + stop_score + alpha_score + uniq_score) / 4.0
