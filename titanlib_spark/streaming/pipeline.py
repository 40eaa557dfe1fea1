"""Structured-Streaming ingestion for the quality pipeline.

The reference is pure batch (SURVEY.md §2.3: no streaming operators), and
the keep/drop rules are row-local or bounded-scope, so streaming support
is an ingestion-shape concern, not a new operator semantics: pages arrive
as files (the WARC-dump pattern), each micro-batch runs the SAME
run_quality_pipeline, and results land in the salted layout.

Exactly-once: foreachBatch is at-least-once, so the sink is made
idempotent by partitioning on batch_id and DYNAMICALLY OVERWRITING that
batch's partitions — a replayed micro-batch (same batch_id after a crash)
rewrites exactly its own output instead of appending duplicates; Spark's
streaming checkpoint owns the source offsets.

Cross-batch dedup: each micro-batch anti-checks its content hashes
against the hashes already written by EARLIER batches (batch_id pruning
keeps the lookback scan cheap: it reads one hash column of prior
partitions only). A page whose extracted text already shipped is kept in
the output for lineage but flagged `cross_batch_duplicate` with
keep=false. Within-batch duplicates are handled by the pipeline itself.

`trigger=availableNow` drains the backlog and stops — the incremental-
batch mode the north rule's resumability requirement describes; leave
`trigger=None` for continuous tailing.

Per-host stateful checks across micro-batches (the applyInPandasWithState
route) are intentionally NOT enabled by default: the perplexity outlier
stage falls back to the global background for thin slices, so micro-batch
locality only affects borderline z-scores. Run the batch pipeline for
final-quality decisions; use streaming for low-latency triage.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from titanlib_spark.flags import BAD
from titanlib_spark.webtext.pipeline import QualityFilterConfig, run_quality_pipeline
from titanlib_spark.webtext.schema import PAGES_SCHEMA

OUT_COLS = [
    "batch_id", "part_id", "url", "warc_ts", "host", "pred_lang",
    "pred_lang_score", "flags", "keep", "reasons", "scrubbed_text",
    "content_hash",
]


def stream_quality_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    cfg: QualityFilterConfig | None = None,
    n_parts: int = 64,
    available_now: bool = True,
    input_format: str = "parquet",
    cross_batch_dedup: bool = True,
):
    """readStream(pages files) -> foreachBatch(quality pipeline +
    cross-batch dedup) -> idempotent batch-partitioned salted parquet.
    Returns the StreamingQuery."""
    cfg = cfg or QualityFilterConfig(
        # iterative per-host refinement is batch-scope; within a micro-batch
        # run a single outlier pass against the global background
        ppl_iterations=1,
        keep_content_hash=True,
    )

    reader = spark.readStream.format(input_format)
    if input_format in ("parquet", "json", "csv"):
        reader = reader.schema(PAGES_SCHEMA)
    stream = reader.load(input_path)

    def _prior_hashes(batch_id: int):
        """Distinct content hashes written by batches < batch_id.
        Column-pruned, partition-pruned scan of the sink itself."""
        try:
            prior = spark.read.parquet(output_path)
        except AnalysisException:
            return None
        return (
            prior.where(F.col("batch_id") < batch_id)
            .select("content_hash")
            .where(F.col("content_hash").isNotNull())
            .distinct()
        )

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = run_quality_pipeline(batch_df, cfg)
        if "content_hash" not in result.columns:
            result = result.withColumn("content_hash", F.lit(None).cast("string"))
        if cross_batch_dedup:
            seen = _prior_hashes(batch_id)
            if seen is not None:
                hit = seen.withColumn("_seen", F.lit(True))
                result = result.join(hit, on="content_hash", how="left")
                is_xdup = F.coalesce(F.col("_seen"), F.lit(False))
                result = (
                    result.withColumn(
                        "reasons",
                        F.when(
                            is_xdup,
                            F.array_union(
                                F.col("reasons"),
                                F.array(F.lit("cross_batch_duplicate")),
                            ),
                        ).otherwise(F.col("reasons")),
                    )
                    .withColumn(
                        "flags", F.when(is_xdup, F.lit(BAD)).otherwise(F.col("flags"))
                    )
                    .withColumn("keep", F.col("keep") & ~is_xdup)
                    .drop("_seen")
                )
        out = result.withColumn(
            "part_id",
            F.pmod(F.xxhash64(F.col(cfg.url_col)), F.lit(int(n_parts))).cast("int"),
        ).withColumn("batch_id", F.lit(batch_id))
        (
            out.select(*OUT_COLS)
            .write.mode("overwrite")
            # replay-idempotent: rewrite ONLY this batch_id's partitions
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "part_id")
            .parquet(output_path)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def running_host_quality(
    pages,
    url_col: str = "url",
    min_words: int = 30,
):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-host RUNNING page/keep counts across micro-batches. The state
    store (not a sink re-scan) carries each host's totals, so the
    operator is O(batch) per trigger and survives restarts through the
    streaming checkpoint — the pattern for cross-batch host reputations
    (a host whose keep-rate decays gets demoted without replaying
    history). Emits one (host, n_pages, n_keep, keep_rate) row per host
    per batch in update mode."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    keep = (F.col("text").isNotNull() & (toks >= int(min_words))).cast("long")
    scored = pages.select(
        F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1).alias("host"),
        keep.alias("_keep"),
    )

    out_schema = StructType(
        [
            StructField("host", StringType()),
            StructField("n_pages", LongType()),
            StructField("n_keep", LongType()),
            StructField("keep_rate", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n_pages", LongType()), StructField("n_keep", LongType())]
    )

    def update(key, pdfs, state):
        n, k = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            k += int(pdf["_keep"].sum())
        state.update((n, k))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_pages": [n],
                "n_keep": [k],
                "keep_rate": [k / n if n else 0.0],
            }
        )

    return scored.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_keep_rates(
    pages,
    time_col: str = "warc_ts",
    watermark: str = "2 hours",
    window_len: str = "1 hour",
    min_words: int = 30,
):
    """Event-time windowed keep-rate telemetry over the page stream — the
    stateful-aggregation shape (withWatermark + window + agg) rather than
    foreachBatch: arrivals and rows passing a row-local keep rule per
    window. The watermark bounds aggregation state and drops late rows
    whose window closed more than `watermark` before the max event time
    seen (state survives restarts via the streaming checkpoint).

    Row-local scoring only (a pure Catalyst predicate), so the windowed
    aggregation is the single stateful operator; full-pipeline verdicts
    stay in stream_quality_pipeline's foreachBatch. Returns a streaming
    DataFrame (window_start, window_end, n_pages, n_keep) — attach a sink
    with outputMode("update") (or "append" for finalized-only windows)."""
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    keep = F.col("text").isNotNull() & (toks >= int(min_words))
    return (
        pages.withColumn("_keep", keep.cast("int"))
        .withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window_len))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("_keep").alias("n_keep"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_pages",
            "n_keep",
        )
    )
