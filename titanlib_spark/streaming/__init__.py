from titanlib_spark.streaming.pipeline import (
    running_host_quality,
    stream_quality_pipeline,
    windowed_keep_rates,
)

__all__ = [
    "running_host_quality",
    "stream_quality_pipeline",
    "windowed_keep_rates",
]
