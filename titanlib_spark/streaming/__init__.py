from titanlib_spark.streaming.pipeline import (
    stream_quality_pipeline,
    windowed_keep_rates,
)

__all__ = ["stream_quality_pipeline", "windowed_keep_rates"]
