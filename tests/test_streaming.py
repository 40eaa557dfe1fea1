"""Streaming ingestion test: availableNow drain -> salted sink -> resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from titanlib_spark.streaming import stream_quality_pipeline
from titanlib_spark.webtext.generate import generate_pages


def test_stream_drain_and_resume(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 400, seed=42).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    pages.where(F.xxhash64("url") % 2 == 0).write.parquet(src)

    q = stream_quality_pipeline(spark, src, out, ckpt, n_parts=4)
    q.awaitTermination(300)
    first = spark.read.parquet(out)
    n_first = first.count()
    assert 0 < n_first < 400
    assert set(first.select("part_id").distinct().toPandas()["part_id"]) <= {0, 1, 2, 3}
    assert "keep" in first.columns and "scrubbed_text" in first.columns

    # new files arrive; resume from the same checkpoint processes ONLY them
    pages.where(F.xxhash64("url") % 2 != 0).write.mode("append").parquet(src)
    q2 = stream_quality_pipeline(spark, src, out, ckpt, n_parts=4)
    q2.awaitTermination(300)
    total = spark.read.parquet(out).count()
    assert total == 400
