from titanlib_spark.streaming.pipeline import stream_quality_pipeline

__all__ = ["stream_quality_pipeline"]
