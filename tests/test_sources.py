"""Sources/sinks tests: schema-enforced reads and salted writes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from titanlib_spark.sources import read_pages, read_table, write_salted
from titanlib_spark.webtext.generate import generate_pages


def test_pages_roundtrip_and_schema_enforcement(spark, tmp_path):
    path = str(tmp_path / "pages")
    pages = generate_pages(spark, 300, seed=42).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    pages.write.parquet(path)
    back = read_pages(spark, path)
    assert back.count() == 300
    assert [f.name for f in back.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]

    # drifted table (missing html, wrong lang type) must fail fast
    bad_path = str(tmp_path / "bad")
    pages.select("url", "warc_ts", "text", F.lit(1).alias("lang")).write.parquet(bad_path)
    with pytest.raises(ValueError, match="schema drift"):
        read_pages(spark, bad_path)


def test_write_salted_balanced(spark, tmp_path):
    out = str(tmp_path / "salted")
    pages = generate_pages(spark, 2000, seed=42)
    write_salted(pages.select("url", "text"), out, n_parts=16)
    back = read_table(spark, out)
    assert back.count() == 2000
    sizes = [r["n"] for r in back.groupBy("part_id").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 16
    # hash balance: no partition more than 2x the mean
    assert max(sizes) < 2 * (sum(sizes) / len(sizes))
