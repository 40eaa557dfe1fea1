"""The full quality-filter pipeline: langid -> heuristics -> dedup ->
perplexity outlier -> scrub, producing keep/drop flags + reasons.

Composition follows the reference's Dataset pipeline semantics
(reference src/dataset.cpp:18-26): checks run in the recommended order
(metadata -> range -> duplicate -> [isolation] -> outlier,
src/sct_resistant.cpp:188-190), flags accumulate monotonically, and the
neighbor-dependent stage (perplexity outlier) sees only rows still GOOD
after the cheap row-local stages — the reference's flag-pushdown
(src/dataset.cpp:222-241) expressed as a filter Catalyst pushes into the
scan.

Everything row-local is a single whole-stage-codegen projection. The WIDE
frame (scrubbed text + features) never shuffles at all: the content-hash
dedup verdict is computed on a slim (url, hash, ts) projection and the
duplicate set joins back broadcast-style (window-over-wide fallback if a
pathological corpus has too many dups to broadcast); the per-host
percentile aggregation inside the outlier loop runs over a slim
checkpointed projection too. The only full-payload movement left is the
salted output write. Shuffle keys (md5, host) are well-distributed — hot
hosts are bounded by the global fallback path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD, apply_check_flags, ensure_flags
from titanlib_spark.webtext import heuristics as H
from titanlib_spark.webtext.dedup import is_duplicate
from titanlib_spark.webtext.features import with_fused_features
from titanlib_spark.webtext.perplexity import perplexity_outlier_check


@dataclass(frozen=True)
class QualityFilterConfig:
    """Gopher/C4-style bounds (the range_check parameter vector)."""

    min_words: int = 20
    max_words: int = 100_000
    min_mean_word_length: float = 2.5
    max_mean_word_length: float = 12.0
    max_symbol_word_ratio: float = 0.25
    min_stopword_ratio: float = 0.12
    min_alpha_word_ratio: float = 0.70
    max_dup_line_frac: float = 0.30
    max_dup_para_frac: float = 0.30
    allowed_langs: tuple[str, ...] = ("en", "de", "fr", "es")
    min_lang_score: float = 0.08
    # drop raw text/html after the single fused UDF pass: downstream
    # shuffles (dedup window, checkpoint, output) then carry only the
    # scrubbed text — at web scale the raw payload never crosses a shuffle
    drop_raw_text: bool = True
    # keep the md5 content hash in the output (cross-batch dedup needs it)
    keep_content_hash: bool = False
    # perplexity outlier stage (the SCT analogue)
    ppl_threshold: float = 6.0
    ppl_num_min: int = 10
    ppl_iterations: int = 5
    # absolute "clearly fine" band: bits/char at or below this is never an
    # outlier (in-domain text scores ~1.5-3.7, random chars ~4.9)
    ppl_valid_max: float = 4.2
    run_ppl_stage: bool = True
    # extract text from html when the text column is null
    extract_missing_text: bool = True
    text_col: str = "text"
    url_col: str = "url"


def host_of(url_col: str = "url"):
    return F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)


def _rule_columns(cfg: QualityFilterConfig) -> dict[str, F.Column]:
    """Named boolean drop-rules over the feature columns. Null feature
    (empty doc) only triggers the empty_text rule — mirrored from the
    reference's flag-invalid-up-front convention (src/buddy_check.cpp:64-67).

    `n_words` is 0 exactly for whitespace-only text and null exactly for
    null text, so emptiness is decidable from the features alone (raw text
    may already be dropped)."""
    empty = F.col("n_words").isNull() | (F.col("n_words") == 0)

    def rng(c, lo=None, hi=None):
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
        return (~empty) & F.coalesce(cond, F.lit(False))

    return {
        "empty_text": empty,
        "min_words": rng(F.col("n_words"), lo=cfg.min_words),
        "max_words": rng(F.col("n_words"), hi=cfg.max_words),
        "mean_word_length": rng(
            F.col("mean_word_length"),
            lo=cfg.min_mean_word_length,
            hi=cfg.max_mean_word_length,
        ),
        "symbol_ratio": rng(F.col("symbol_word_ratio"), hi=cfg.max_symbol_word_ratio),
        "stopword_ratio": rng(F.col("stopword_ratio"), lo=cfg.min_stopword_ratio),
        "alpha_word_ratio": rng(F.col("alpha_word_ratio"), lo=cfg.min_alpha_word_ratio),
        "dup_line_frac": rng(F.col("dup_line_frac"), hi=cfg.max_dup_line_frac),
        "dup_para_frac": rng(F.col("dup_para_frac"), hi=cfg.max_dup_para_frac),
        "lang": (~empty)
        & (
            ~F.col("pred_lang").isin(*cfg.allowed_langs)
            | (F.col("pred_lang_score") < cfg.min_lang_score)
        ),
        "duplicate": F.col("is_duplicate"),
    }


def run_quality_pipeline(
    df: DataFrame, cfg: QualityFilterConfig | None = None
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) -> + (flags, keep, reasons,
    pred_lang, pred_lang_score, ppl, scrubbed_text, host)."""
    cfg = cfg or QualityFilterConfig()
    t = cfg.text_col

    df = df.withColumn("host", host_of(cfg.url_col))
    # fused extract+langid+features+perplexity+scrub+hash pandas UDF: ONE
    # Arrow pass over the raw payload (~35x the interpreted HOF expression
    # path, and no further text round-trips; see features.py).
    # heuristics.py remains the oracle-checked reference semantics.
    html_col = "html" if (cfg.extract_missing_text and "html" in df.columns) else None
    df = with_fused_features(df, text_col=t, html_col=html_col)
    if cfg.drop_raw_text:
        df = df.drop(t, "html")

    # Materialize the UDF output BEFORE any shuffle, then decide dedup on
    # a slim (row_id, hash, ts, url) projection: the duplicate verdict is
    # computed without moving the wide payload, and the (small) duplicate
    # set joins back broadcast-style — the pipeline then has ZERO
    # wide-frame shuffles. If duplicates are too many to broadcast
    # (pathological corpus), fall back to the classic window over the wide
    # frame — the same single wide shuffle as before, never worse.
    #
    # The join-back key is a surrogate row id stamped INSIDE the
    # checkpoint, not the url: recrawls make url non-unique (same url,
    # later warc_ts, same content is the common duplicate), so a url-keyed
    # join would flag the first-occurrence keeper alongside its dup and
    # fan out when several dups share one url. The id is physically
    # materialized by the checkpoint, so both branches below (the slim
    # verdict and the wide frame) see identical values.
    df = df.withColumn("_row_id", F.monotonically_increasing_id())
    # lazy: the dup count below materializes the checkpoint inside its own
    # job instead of paying a separate dispatch (A/B best 2.66 vs 2.80 at
    # 20k docs, scoped-cleanup protocol)
    df = df.localCheckpoint(eager=False)
    # materialize the (tiny) dup-id set once: without this, every
    # downstream action that touches the broadcast side — the count here,
    # the ppl stage's slim checkpoint, the final write — re-executes the
    # slim window shuffle and rebuilds the broadcast (measured 3x window
    # re-execution at bench scale). Lazy checkpoint: the count
    # materializes the blocks in the same job instead of paying a
    # separate eager-materialize job. (A/B-measured at 20k docs: this
    # slim+broadcast shape beats the classic wide-frame window even at
    # small scale — the re-executed wide shuffle costs more than the
    # slim-projection jobs — so there is no small-input special case.)
    slim_dup = is_duplicate(
        df.select("_row_id", cfg.url_col, "content_hash", "warc_ts"),
        hash_col="content_hash",
    ).where(F.col("is_duplicate")).select("_row_id").localCheckpoint(eager=False)
    n_dup = slim_dup.count()
    if n_dup <= 1_000_000:
        hit = slim_dup.withColumn("_is_dup", F.lit(True))
        df = (
            df.join(F.broadcast(hit), on="_row_id", how="left")
            .withColumn("is_duplicate", F.coalesce(F.col("_is_dup"), F.lit(False)))
            .drop("_is_dup")
        )
    else:
        df = is_duplicate(df, hash_col="content_hash")
    if not cfg.keep_content_hash:
        df = df.drop("content_hash")

    rules = _rule_columns(cfg)
    reasons = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in rules.items()])
    )
    df = df.withColumn("reasons", reasons)
    df = ensure_flags(df)
    df = apply_check_flags(df, F.when(F.size("reasons") > 0, BAD).otherwise(GOOD))

    if cfg.run_ppl_stage:
        # the chain from the pre-shuffle checkpoint is narrow (broadcast
        # join + row-local exprs): cheap to evaluate for both consumers
        # (the ppl slim projection and the final output), so no second
        # checkpoint is needed
        df = perplexity_outlier_check(
            df,
            group_col="host",
            threshold=cfg.ppl_threshold,
            num_min=cfg.ppl_num_min,
            num_iterations=cfg.ppl_iterations,
            valid_max=cfg.ppl_valid_max,
            id_col="_row_id",  # url is non-unique under recrawls
        )
        df = df.withColumn(
            "reasons",
            F.when(
                (F.col("flags") != GOOD) & (F.size("reasons") == 0),
                F.array(F.lit("ppl_outlier")),
            ).otherwise(F.col("reasons")),
        )

    # scrubbed_text already attached by the fused UDF pass
    return df.withColumn("keep", F.col("flags") == GOOD).drop("_row_id")
