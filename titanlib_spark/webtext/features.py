"""Fused langid + quality-feature extraction in ONE Arrow-vectorized
pandas UDF.

Semantically identical to titanlib_spark.webtext.langid.classify_batch +
titanlib_spark.webtext.heuristics (tests assert exact equality), but one
Arrow round-trip computes everything. Rationale, measured on this box:
Spark's interpreted higher-order-function path costs ~2.5 ms/doc for the
feature set (per-token lambdas see no codegen and no common-subexpression
elimination), while the same work as pandas str/list ops costs ~0.07
ms/doc — a ~35x difference that directly bounds pipeline docs/sec. The
expression versions in `heuristics.py` remain the reference semantics
(used by the DuckDB-oracle parity queries); this UDF is the hot path.

All ratios are int/int divisions evaluated in the same order as the
expression versions, so the doubles are bit-identical.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from titanlib_spark.webtext.langid import _MIN_SCORE, _STOPSETS
from titanlib_spark.webtext.lexicon import LANGS

FEATURES_TYPE = T.StructType(
    [
        T.StructField("pred_lang", T.StringType()),
        T.StructField("pred_lang_score", T.DoubleType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("mean_word_length", T.DoubleType()),
        T.StructField("symbol_word_ratio", T.DoubleType()),
        T.StructField("stopword_ratio", T.DoubleType()),
        T.StructField("alpha_word_ratio", T.DoubleType()),
        T.StructField("dup_line_frac", T.DoubleType()),
        T.StructField("dup_para_frac", T.DoubleType()),
        # fused downstream stages (same Arrow pass, same semantics as
        # perplexity.score_batch / scrub.reference_scrub / extract /
        # Spark's md5()):
        T.StructField("ppl", T.DoubleType()),
        T.StructField("scrubbed_text", T.StringType()),
        T.StructField("scrub_changed", T.BooleanType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

_NON_ALPHA = re.compile(r"[^a-z]")
_HAS_ALPHA = re.compile(r"[a-zA-Z]")


def _dup_frac(parts: list[str]) -> float:
    n = len(parts)
    return 1.0 - len(set(parts)) / n if n else None


def analyze_batch(texts: pd.Series, htmls: pd.Series | None = None) -> pd.DataFrame:
    """Vectorized where pandas allows; tight python loops only over the
    pre-split token lists (no per-row regex re-compilation).

    When `htmls` is given, rows with null text are extracted from their
    html bytes IN THIS PASS — a separate coalesce(text, extract_udf(html))
    column would ship every html blob to python unconditionally (Spark
    evaluates python UDFs inside conditionals for all rows)."""
    import hashlib

    from titanlib_spark.webtext.extract import extract_text_py
    from titanlib_spark.webtext.perplexity import _CHAR_IDX, _TABLES
    from titanlib_spark.webtext.scrub import reference_scrub

    idx = texts.index
    out = {
        k.name: np.full(len(texts), None, dtype=object) for k in FEATURES_TYPE.fields
    }
    tvals = texts.to_numpy(dtype=object)
    hvals = htmls.to_numpy(dtype=object) if htmls is not None else None
    for i, t in enumerate(tvals):
        if (t is None or not isinstance(t, str)) and hvals is not None:
            h = hvals[i]
            if h is not None:
                t = extract_text_py(bytes(h))
        if t is None or not isinstance(t, str):
            continue
        stripped = t.strip()
        toks = stripped.split() if stripped else []
        nw = len(toks)
        out["n_chars"][i] = len(t)
        out["n_words"][i] = nw

        # langid over raw lowercase tokens (classify_batch semantics)
        low = [w.lower() for w in toks]
        best_lang, best_score = "und", 0.0
        if low:
            nlow = len(low)
            for lg in LANGS:
                ss = _STOPSETS[lg]
                hits = sum(1 for w in low if w in ss)
                score = hits / nlow
                if score > best_score:
                    best_lang, best_score = lg, score
        lang = best_lang if best_score >= _MIN_SCORE else "und"
        out["pred_lang"][i] = lang
        out["pred_lang_score"][i] = best_score

        # clean tokens: lowercase, alpha-only, empties dropped
        ct = [w for w in (_NON_ALPHA.sub("", w) for w in low) if w]
        if ct:
            out["mean_word_length"][i] = sum(len(w) for w in ct) / len(ct)
            stops = _STOPSETS[lang if lang in _STOPSETS else "en"]
            out["stopword_ratio"][i] = sum(1 for w in ct if w in stops) / len(ct)
        if nw:
            hashes = t.count("#")
            ellipses = (len(t) - len(t.replace("...", ""))) / 3
            out["symbol_word_ratio"][i] = (hashes + ellipses) / nw
            out["alpha_word_ratio"][i] = (
                sum(1 for w in toks if _HAS_ALPHA.search(w)) / nw
            )
        out["dup_line_frac"][i] = _dup_frac(t.split("\n"))
        out["dup_para_frac"][i] = _dup_frac(t.split("\n\n"))

        # char-bigram cross-entropy under the predicted language's table
        # (perplexity.score_batch semantics: >=2 chars, und -> en table)
        if len(t) >= 2:
            table = _TABLES.get(lang, _TABLES["en"])
            cidx = _CHAR_IDX[
                np.frombuffer(t.lower().encode("latin-1", "replace"), dtype=np.uint8)
            ]
            out["ppl"][i] = float(table[cidx[:-1], cidx[1:]].mean())

        scrubbed = reference_scrub(t)
        out["scrubbed_text"][i] = scrubbed
        out["scrub_changed"][i] = scrubbed != t
        if stripped:  # empty docs are non-hashable (dedup skips them)
            out["content_hash"][i] = hashlib.md5(t.encode("utf-8")).hexdigest()

    df = pd.DataFrame(out, index=idx)
    for c in ("n_chars", "n_words"):
        df[c] = df[c].astype("Int32")
    df["scrub_changed"] = df["scrub_changed"].astype("boolean")
    skip = ("pred_lang", "scrubbed_text", "scrub_changed", "content_hash",
            "n_chars", "n_words")
    for c in df.columns:
        if c not in skip:
            df[c] = pd.to_numeric(df[c], errors="coerce")
    return df


@F.pandas_udf(FEATURES_TYPE)
def _features_udf(text: pd.Series, html: pd.Series) -> pd.DataFrame:
    return analyze_batch(text, html)


def with_fused_features(
    df: DataFrame, text_col: str = "text", html_col: str | None = None
) -> DataFrame:
    """Attach pred_lang, pred_lang_score, the 8 quality features, ppl,
    scrubbed_text and content_hash via the fused UDF (one Arrow pass).
    Pass `html_col` to also fuse null-text extraction into the same pass."""
    html = F.col(html_col) if html_col else F.lit(None).cast("binary")
    tmp = df.withColumn("_feat", _features_udf(F.col(text_col), html))
    for f in FEATURES_TYPE.fields:
        tmp = tmp.withColumn(f.name, F.col(f"_feat.{f.name}"))
    return tmp.drop("_feat")
