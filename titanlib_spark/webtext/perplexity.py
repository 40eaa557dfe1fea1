"""Character-bigram perplexity scoring + neighborhood outlier rejection.

The SCT analogue named by the north_star ("a batched character/word n-gram
hash + KenLM-style perplexity scorer flags outlier documents"). Two parts:

1. **Scorer** — per-language character-bigram log-probability tables built
   deterministically at import from the embedded lexicon corpus (Laplace
   smoothing over a 30-symbol alphabet). A KenLM deployment swaps the
   table lookup for a real model inside the same Arrow-vectorized UDF.
   Score = mean negative log2 probability per character transition
   (bits/char); random character soup scores ~log2(30) ≈ 4.9, in-domain
   text ~1.5-2.5 — a wide, stable margin.

2. **Outlier check** — the reference SCT decision recast
   (reference src/sct_resistant.cpp:971-1011: score normalized by robust
   neighborhood statistics z = (chi - median) / (IQR + IQR/sqrt(n)), flag
   above threshold; hierarchy global -> outer -> inner from
   src/util.cpp:232-295 becomes host-stats-with-global-fallback here).
   Hosts with fewer than `num_min` scoreable docs fall back to the global
   background instead of being skipped — the accept_isolated decision is
   thereby made *safe* (isolated docs still get QC'd, against the global
   profile). Iterates until no new flags (early stop,
   src/buddy_check.cpp:161-176), flagging all above-threshold docs per
   round (the reference's worst-only-per-centroid is a serialization
   artifact of overlapping neighborhoods; host groups are disjoint, so
   batch rejection per group converges to the same fixpoint).

Plan shape per iteration: one groupBy(host) exact-percentile aggregation
(map-side partial), one broadcast of the tiny stats table back — no
row-explosion joins, no Python in the loop (the scorer UDF runs once,
before the loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from titanlib_spark.flags import BAD, GOOD, apply_check_flags, ensure_flags
from titanlib_spark.webtext.lexicon import CONTENT_WORDS, LANGS, STOPWORDS

_ALPHABET = "abcdefghijklmnopqrstuvwxyz .\n?"  # '?' = out-of-alphabet bucket
_A = len(_ALPHABET)
_CHAR_IDX = np.full(256, _ALPHABET.index("?"), dtype=np.int64)
for _i, _c in enumerate(_ALPHABET):
    _CHAR_IDX[ord(_c)] = _i


def _train_table(corpus: str) -> np.ndarray:
    """Laplace-smoothed bigram -log2 P(next|prev) table, shape (A, A)."""
    idx = _CHAR_IDX[np.frombuffer(corpus.encode("latin-1", "replace"), dtype=np.uint8)]
    counts = np.ones((_A, _A), dtype=np.float64)  # add-one smoothing
    np.add.at(counts, (idx[:-1], idx[1:]), 1.0)
    probs = counts / counts.sum(axis=1, keepdims=True)
    return -np.log2(probs)


def _corpus(lang: str) -> str:
    words = list(STOPWORDS[lang]) + list(CONTENT_WORDS[lang])
    # repeat to weight transitions like running text; deterministic order
    line = " ".join(words) + ".\n"
    return line * 4


_TABLES: dict[str, np.ndarray] = {lang: _train_table(_corpus(lang)) for lang in LANGS}


def score_batch(texts: pd.Series, langs: pd.Series) -> pd.Series:
    """bits/char bigram cross-entropy of each doc under its language table
    (unknown language -> English table)."""
    out = np.full(len(texts), np.nan)
    tvals = texts.to_numpy(dtype=object)
    lvals = langs.to_numpy(dtype=object)
    for i in range(len(tvals)):
        t = tvals[i]
        if t is None or not isinstance(t, str) or len(t) < 2:
            continue
        table = _TABLES.get(lvals[i], _TABLES["en"])
        idx = _CHAR_IDX[
            np.frombuffer(t.lower().encode("latin-1", "replace"), dtype=np.uint8)
        ]
        out[i] = table[idx[:-1], idx[1:]].mean()
    return pd.Series(out, index=texts.index)


@F.pandas_udf(T.DoubleType())
def _ppl_udf(text: pd.Series, lang: pd.Series) -> pd.Series:
    return score_batch(text, lang)


def perplexity(text_col: str | Column = "text",
               lang_col: str | Column = "pred_lang") -> Column:
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    lg = F.col(lang_col) if isinstance(lang_col, str) else lang_col
    return _ppl_udf(t, lg)


def perplexity_outlier_check(
    df: DataFrame,
    group_col: str = "host",
    threshold: float = 6.0,
    num_min: int = 10,
    num_iterations: int = 5,
    ppl_col: str = "ppl",
    flag_col: str = "flags",
    valid_max: float | None = None,
    id_col: str = "url",
) -> DataFrame:
    """Flag docs whose perplexity is a robust-z outlier vs their host peers
    (global-background fallback for thin hosts). `ppl_col` must already be
    attached (see :func:`perplexity`); null ppl rows are not candidates
    (they are handled by metadata/range stages).

    `valid_max` is the reference's *valid value band* (fgt/sct_resistant
    value_minv/maxv, reference src/fgt.cpp:875-889: a score inside the
    valid band vouches for the row — it is never a rejection candidate,
    however extreme its z against an unusually tight neighborhood).

    The fixpoint loop runs over a slim (id, group, ppl, flag) projection —
    materialized once — so per-iteration checkpoints never re-serialize
    the wide page payload (html/text); the accumulated verdicts join back
    onto the full frame exactly once at the end."""
    df = ensure_flags(df, flag_col)
    # materialize the slim working set ONCE: every iteration makes several
    # passes (group stats, global stats, verdict join, fixpoint count) and
    # must not re-run the upstream langid/feature UDF chain each time
    slim = df.select(
        F.col(id_col).alias("_pid"),
        F.col(group_col),
        F.col(ppl_col),
        F.col(flag_col),
        F.col(flag_col).alias("_flag0"),  # pre-loop flag, to extract the delta
    ).localCheckpoint(eager=True)
    prev_bad = slim.where(F.col(flag_col) != GOOD).count()

    n_hosts = None  # host cardinality is loop-invariant: count it once
    for _ in range(int(num_iterations)):
        good = slim.where((F.col(flag_col) == GOOD) & F.col(ppl_col).isNotNull())
        # one rollup job computes per-host stats AND the global background
        # (the grand-total row) — the reference's global->outer hierarchy
        # (src/util.cpp:232-295) in a single shuffle
        stats = (
            good.rollup(group_col)
            .agg(
                F.expr(f"percentile({ppl_col}, 0.5)").alias("_h_mu"),
                (
                    F.expr(f"percentile({ppl_col}, 0.75)")
                    - F.expr(f"percentile({ppl_col}, 0.25)")
                ).alias("_h_iqr"),
                F.count(F.lit(1)).alias("_h_n"),
            )
            .localCheckpoint(eager=True)  # stays distributed: host count is
        )                                 # unbounded at web scale
        global_row = stats.where(F.col(group_col).isNull()).first()
        if global_row is None or global_row["_h_n"] == 0:
            break
        g_mu, g_iqr, g_n = global_row["_h_mu"], global_row["_h_iqr"], global_row["_h_n"]
        host_stats = stats.where(F.col(group_col).isNotNull())

        # checkpointed frames carry no size stats, so AQE can't see that
        # host_stats is tiny — hint broadcast explicitly while the host
        # cardinality is broadcastable (the common case: #hosts << #docs);
        # beyond that fall back to a shuffle join. The count is taken once:
        # hosts never appear mid-loop, so the plan choice is loop-invariant
        if n_hosts is None:
            n_hosts = host_stats.count()
        if n_hosts <= 2_000_000:
            host_stats = F.broadcast(host_stats)
        joined = slim.join(host_stats, on=group_col, how="left")
        use_host = F.col("_h_n").isNotNull() & (F.col("_h_n") >= int(num_min))
        mu = F.when(use_host, F.col("_h_mu")).otherwise(F.lit(float(g_mu)))
        iqr = F.when(use_host, F.col("_h_iqr")).otherwise(F.lit(float(g_iqr or 0.0)))
        n = F.when(use_host, F.col("_h_n")).otherwise(F.lit(int(g_n)))
        denom = iqr + iqr / F.sqrt(n.cast("double"))
        # degenerate spread (IQR=0): fall back to a fixed floor so wild
        # outliers are still caught (reference clamps scales the same way,
        # e.g. min_horizontal_scale src/sct_resistant.cpp:882-912)
        z = (F.col(ppl_col) - mu) / F.when(denom > 1e-9, denom).otherwise(F.lit(0.25))
        verdict = F.col(ppl_col).isNotNull() & (z > float(threshold))
        if valid_max is not None:
            verdict = verdict & (F.col(ppl_col) > float(valid_max))
        new_slim = apply_check_flags(
            joined, F.when(verdict, BAD).otherwise(GOOD), flag_col
        ).drop("_h_mu", "_h_iqr", "_h_n")
        new_slim = new_slim.localCheckpoint(eager=True)
        new_bad = new_slim.where(F.col(flag_col) != GOOD).count()
        # rule 17: drop the previous round's blocks once the new round is
        # materialized — dead checkpoints squeeze execution memory
        slim.unpersist()
        stats.unpersist()
        slim = new_slim
        if new_bad == prev_bad:
            break
        prev_bad = new_bad

    # join back only the DELTA — rows the loop newly flagged. Outliers are
    # rare by construction, so this side broadcasts at any corpus size and
    # the wide frame never reshuffles (a full verdict join would move the
    # whole payload again).
    delta = slim.where(F.col(flag_col) != F.col("_flag0")).select(
        F.col("_pid"), F.col(flag_col).alias("_ppl_flag")
    )
    out = df.join(
        F.broadcast(delta), on=F.col(id_col) == F.col("_pid"), how="left"
    )
    return out.withColumn(
        flag_col, F.coalesce(F.col("_ppl_flag"), F.col(flag_col))
    ).drop("_pid", "_ppl_flag")
