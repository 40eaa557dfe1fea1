"""Sources and sinks.

The reference has no I/O layer at all — data arrives as in-memory numpy
vectors through SWIG (reference swig/titanlib.i:42-55); its test harness
reads YAML/CSV (tests/bulk_test.py:22-24). A 100 TB engine needs real
connectors, so this module provides:

* `read_table` — format-dispatching reader (parquet/csv/json, or
  `iceberg` against a configured catalog) with optional schema
  enforcement — enforcement FAILS FAST on drift instead of silently
  casting;
* `read_pages` — the pages-table reader (url, warc_ts, html, text, lang)
  used by the webtext pipeline;
* `write_salted` — hash-salted, size-balanced partitioned writes (the
  skew-proof layout the north rule requires; see webtext.checkpoint for
  the resumable-progress variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from titanlib_spark.webtext.schema import PAGES_SCHEMA


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    reader = spark.read.format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "iceberg":
        df = reader.load(path)  # path = catalog.db.table
    else:
        if schema is not None and fmt in ("csv", "json"):
            reader = reader.schema(schema)
        df = reader.load(path)
    if schema is not None:
        got = {f.name: f.dataType for f in df.schema.fields}
        missing = [f.name for f in schema.fields if f.name not in got]
        wrong = [
            (f.name, str(got[f.name]), str(f.dataType))
            for f in schema.fields
            if f.name in got and got[f.name] != f.dataType
        ]
        if missing or wrong:
            raise ValueError(
                f"schema drift reading {path}: missing={missing} wrong={wrong}"
            )
        df = df.select(*[f.name for f in schema.fields])
    return df


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a Common-Crawl-style pages table, enforcing the canonical
    (url, warc_ts, html, text, lang) shape."""
    return read_table(spark, path, fmt=fmt, schema=PAGES_SCHEMA)


def write_salted(
    df: DataFrame,
    path: str,
    n_parts: int = 64,
    salt_col: str = "url",
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_col: str = "part_id",
) -> None:
    """Hash-salted partitioned write: part_id = xxhash64(salt_col) % n_parts.

    Salting on a row-unique key (url) is host-independent, so Zipf-hot
    hosts spread uniformly — partition sizes are balanced by the hash, not
    by luck. One repartition shuffle; AQE coalesces undersized outputs."""
    salted = df.withColumn(
        partition_col,
        F.pmod(F.xxhash64(F.col(salt_col)), F.lit(int(n_parts))).cast("int"),
    )
    (
        salted.repartition(F.col(partition_col))
        .write.mode(mode)
        .partitionBy(partition_col)
        .format(fmt)
        .save(path)
    )
