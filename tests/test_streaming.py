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


def test_cross_batch_dedup_flags_second_occurrence(spark, tmp_path):
    """The same text in two micro-batches: kept in batch 1, flagged
    cross_batch_duplicate (keep=false) in batch 2."""
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 60, seed=7).select(
        "url", "warc_ts", "html", "text", "lang"
    ).localCheckpoint()
    pages.write.parquet(src)
    q = stream_quality_pipeline(spark, src, out, ckpt, n_parts=2)
    q.awaitTermination(300)

    # batch 2: same texts under NEW urls
    clones = pages.withColumn("url", F.concat(F.lit("https://clone.example/"), F.col("url")))
    clones.write.mode("append").parquet(src)
    q2 = stream_quality_pipeline(spark, src, out, ckpt, n_parts=2)
    q2.awaitTermination(300)

    res = spark.read.parquet(out)
    second = res.where(F.col("url").startswith("https://clone.example/"))
    flagged = second.where(F.array_contains("reasons", "cross_batch_duplicate"))
    n_hashable = second.where(F.col("content_hash").isNotNull()).count()
    assert n_hashable > 0
    assert flagged.count() == n_hashable
    assert flagged.where(F.col("keep")).count() == 0
    # batch 1 rows untouched
    first = res.where(~F.col("url").startswith("https://clone.example/"))
    assert first.where(F.array_contains("reasons", "cross_batch_duplicate")).count() == 0


def test_cross_batch_dedup_is_state_store_not_sink_scan(spark, tmp_path):
    """O(batch) per trigger: the seen-hash set lives in the streaming
    state store, so dedup verdicts survive the SINK being deleted between
    triggers — impossible for a design that re-reads prior sink
    partitions. Also covers scheme-insensitive key parity (same text under
    an HTTPS:// url still collides)."""
    import shutil

    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 40, seed=11).select(
        "url", "warc_ts", "html", "text", "lang"
    ).localCheckpoint()
    pages.write.parquet(src)
    q = stream_quality_pipeline(spark, src, out, ckpt, n_parts=2)
    q.awaitTermination(300)

    # destroy every prior sink partition; the state store must still know
    shutil.rmtree(out)

    clones = pages.withColumn(
        "url", F.concat(F.lit("HTTPS://clone.example/"), F.col("url"))
    )
    clones.write.mode("append").parquet(src)
    q2 = stream_quality_pipeline(spark, src, out, ckpt, n_parts=2)
    q2.awaitTermination(300)

    second = spark.read.parquet(out).where(
        F.col("url").startswith("HTTPS://clone.example/")
    )
    n_hashable = second.where(F.col("content_hash").isNotNull()).count()
    assert n_hashable > 0
    flagged = second.where(F.array_contains("reasons", "cross_batch_duplicate"))
    assert flagged.count() == n_hashable
    assert flagged.where(F.col("keep")).count() == 0


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Simulated replay (fresh checkpoint, same input, same output): the
    batch_id partitions are dynamically overwritten, not appended."""
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")

    pages = generate_pages(spark, 80, seed=3).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    pages.write.parquet(src)
    q = stream_quality_pipeline(spark, src, out, str(tmp_path / "ckpt1"), n_parts=2)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # replay: same files re-delivered as batch 0 against the same sink
    q2 = stream_quality_pipeline(spark, src, out, str(tmp_path / "ckpt2"), n_parts=2)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1


def test_windowed_keep_rates_watermark_drops_late_rows(spark, tmp_path):
    """The stateful-aggregation shape: event-time windows + watermark.
    A row arriving after its window closed beyond the watermark is
    dropped; an in-watermark late row updates its window. Watermark state
    survives the availableNow restart via the checkpoint."""
    from datetime import datetime

    from titanlib_spark.streaming import windowed_keep_rates
    from titanlib_spark.webtext.schema import PAGES_SCHEMA

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    long_text = "word " * 40
    page = lambda ts, text: (f"u://{ts.isoformat()}", ts, None, text, "en")

    rows1 = [
        page(datetime(2024, 1, 1, 10, 0), long_text),
        page(datetime(2024, 1, 1, 10, 30), "too short"),
        page(datetime(2024, 1, 1, 11, 15), long_text),
    ]
    spark.createDataFrame(rows1, PAGES_SCHEMA).write.mode("append").parquet(src)

    def drain():
        # memory sink cannot recover from a checkpoint; collect the
        # update-mode rows driver-side via foreachBatch instead
        updates = []

        def sink(bdf, _bid):
            updates.extend(bdf.collect())

        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
        q = (
            windowed_keep_rates(stream, watermark="2 hours", window_len="1 hour")
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {r.window_start.hour: (r.n_pages, r.n_keep) for r in updates}

    t1 = drain()
    assert t1[10] == (2, 1) and t1[11] == (1, 1)

    # watermark is now 11:15 - 2h = 09:15: the 08:00 row's window closed
    # at 09:00 < watermark -> dropped; 11:45 updates the open 11:00 window
    rows2 = [
        page(datetime(2024, 1, 1, 8, 0), long_text),
        page(datetime(2024, 1, 1, 11, 45), long_text),
    ]
    spark.createDataFrame(rows2, PAGES_SCHEMA).write.mode("append").parquet(src)

    t2 = drain()
    assert 8 not in t2
    assert t2[11] == (2, 2)


def test_running_host_quality_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState: per-host running totals accumulate across
    micro-batches AND across an availableNow restart (state store via the
    streaming checkpoint), with no sink re-scan."""
    from titanlib_spark.streaming import running_host_quality
    from titanlib_spark.webtext.schema import PAGES_SCHEMA
    from datetime import datetime

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    long_text = "word " * 40
    ts = datetime(2024, 1, 1, 12, 0)
    mk = lambda host, text, i: (f"https://{host}/p{i}", ts, None, text, "en")

    rows1 = [mk("a.example", long_text, 1), mk("a.example", "short", 2),
             mk("b.example", long_text, 3)]
    spark.createDataFrame(rows1, PAGES_SCHEMA).write.mode("append").parquet(src)

    def drain():
        state = {}

        def sink(bdf, _bid):
            for r in bdf.collect():
                state[r.host] = (r.n_pages, r.n_keep)

        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
        q = (
            running_host_quality(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return state

    t1 = drain()
    assert t1["a.example"] == (2, 1) and t1["b.example"] == (1, 1)

    rows2 = [mk("a.example", long_text, 4), mk("c.example", "tiny", 5)]
    spark.createDataFrame(rows2, PAGES_SCHEMA).write.mode("append").parquet(src)

    t2 = drain()
    # a's totals CONTINUED from the persisted state; c starts fresh
    assert t2["a.example"] == (3, 2)
    assert t2["c.example"] == (1, 0)


def test_cross_batch_dedup_null_url_unhashable_row(spark, tmp_path):
    """A row with NULL url AND unhashable payload must not kill the
    micro-batch (regression: coalesce of two NULLs made the state group
    key None and update() crashed on key[0].startswith)."""
    import datetime

    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 30, seed=11).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    from pyspark.sql import types as T

    from titanlib_spark.webtext.schema import PAGES_SCHEMA

    # nullability in parquet is advisory: a malformed upstream write CAN
    # hand the stream a NULL url, whatever the declared schema says
    nullable_pages = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in PAGES_SCHEMA.fields]
    )
    broken = spark.createDataFrame(
        [
            (None, datetime.datetime(2024, 1, 1), None, None, None),
            (None, datetime.datetime(2024, 1, 2), None, "   ", None),
        ],
        schema=nullable_pages,
    )
    pages.unionByName(broken).write.parquet(src)
    q = stream_quality_pipeline(spark, src, out, ckpt, n_parts=2)
    q.awaitTermination(300)

    res = spark.read.parquet(out)
    assert res.count() == 32
    nulls = res.where(F.col("url").isNull())
    assert nulls.count() == 2
    # unhashable rows are never cross-batch duplicates, just dropped as empty
    assert nulls.where(F.array_contains("reasons", "cross_batch_duplicate")).count() == 0
    assert nulls.where(F.col("keep")).count() == 0


def test_cross_batch_near_dups_stream_matches_batch_replay(spark, tmp_path):
    """MinHash-LSH state-store near-dup marking: near-clones arriving in a
    LATER micro-batch are flagged, dissimilar docs are not, and the
    streaming verdicts equal the oracle-checked batch replay
    (near_dup_marks_batch) on the same batch split."""
    from titanlib_spark.streaming.near_dedup import (
        fold_near_dup_verdicts,
        mark_cross_batch_near_dups,
        near_dup_marks_batch,
    )

    src = str(tmp_path / "nd_in")
    out = str(tmp_path / "nd_out")
    ckpt = str(tmp_path / "nd_ckpt")

    import random

    rng = random.Random(13)
    words = [f"tok{i}" for i in range(400)]
    bases = [
        " ".join(rng.choice(words) for _ in range(60)) for _ in range(8)
    ]
    batch1 = [(i, bases[i]) for i in range(8)]
    batch1.append((8, "tiny"))          # no shingle at n=5? len>=5 -> has
    batch1.append((9, None))            # null text: never a candidate
    # batch 2: near-clones of docs 0-3 (tail append: high shingle overlap),
    # plus 4 fresh dissimilar docs
    batch2 = [(100 + i, bases[i] + " zz") for i in range(4)]
    batch2 += [
        (200 + i, " ".join(rng.choice(words) for _ in range(60)))
        for i in range(4)
    ]

    schema = "doc_id long, text string"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src)

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        marked = mark_cross_batch_near_dups(stream, key_col="doc_id")

        def proc(bdf, bid):
            folded = fold_near_dup_verdicts(bdf, key_col="doc_id")
            folded.select("doc_id", "_xb_near_dup").write.mode("append").parquet(out)

        q = (
            marked.writeStream.foreachBatch(proc)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    drain()

    got = {
        r.doc_id: r._xb_near_dup for r in spark.read.parquet(out).collect()
    }
    assert len(got) == len(batch1) + len(batch2)
    # clones flagged, their batch-1 originals not, fresh docs not
    for i in range(4):
        assert got[100 + i] is True, (100 + i, got)
        assert got[i] is False
    for i in range(4):
        assert got[200 + i] is False
    assert got[9] is False

    # exact agreement with the oracle-checked batch replay
    all_rows = [(0, i, t) for i, t in batch1] + [(1, i, t) for i, t in batch2]
    replay = near_dup_marks_batch(
        spark.createDataFrame(all_rows, "batch_id long, doc_id long, text string"),
        "batch_id", "doc_id", "text",
    )
    want = {r.doc_id: r.near_dup for r in replay.collect()}
    assert got == want
