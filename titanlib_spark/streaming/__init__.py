from titanlib_spark.streaming.pipeline import (
    host_key,
    mark_cross_batch_dups,
    running_host_quality,
    stream_quality_pipeline,
    windowed_keep_rates,
)

__all__ = [
    "host_key",
    "mark_cross_batch_dups",
    "running_host_quality",
    "stream_quality_pipeline",
    "windowed_keep_rates",
]
