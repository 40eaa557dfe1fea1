"""Per-stage wall breakdown of run_quality_pipeline at the bench config,
repeated to expose which stage carries the run-to-run variance."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import materialize, steal_pct  # noqa: E402
from titanlib_spark.flags import BAD, GOOD, apply_check_flags, ensure_flags  # noqa: E402
from titanlib_spark.session import get_spark  # noqa: E402
from titanlib_spark.webtext.dedup import is_duplicate  # noqa: E402
from titanlib_spark.webtext.features import with_fused_features  # noqa: E402
from titanlib_spark.webtext.generate import generate_pages  # noqa: E402
from titanlib_spark.webtext.perplexity import perplexity_outlier_check  # noqa: E402
from titanlib_spark.webtext.pipeline import (  # noqa: E402
    QualityFilterConfig,
    _rule_columns,
    host_of,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QC_DOCS = int(os.environ.get("SPARK_GRAFT_QC_DOCS", "20000"))


def run_staged(pages, cfg):
    t = {}

    def clock(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 3)
        return out

    df = pages.withColumn("host", host_of(cfg.url_col))
    df = with_fused_features(df, text_col=cfg.text_col, html_col="html")
    df = df.drop(cfg.text_col, "html")
    df = df.withColumn("_row_id", F.monotonically_increasing_id())
    df = clock("1_wide_checkpoint", lambda: df.localCheckpoint(eager=True))

    slim_dup = is_duplicate(
        df.select("_row_id", cfg.url_col, "content_hash", "warc_ts"),
        hash_col="content_hash",
    ).where(F.col("is_duplicate")).select("_row_id")
    n_dup = clock("2_ndup_count", slim_dup.count)
    hit = slim_dup.withColumn("_is_dup", F.lit(True))
    df = (
        df.join(F.broadcast(hit), on="_row_id", how="left")
        .withColumn("is_duplicate", F.coalesce(F.col("_is_dup"), F.lit(False)))
        .drop("_is_dup")
    )
    df = df.drop("content_hash")

    rules = _rule_columns(cfg)
    reasons = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in rules.items()])
    )
    df = df.withColumn("reasons", reasons)
    df = ensure_flags(df)
    df = apply_check_flags(df, F.when(F.size("reasons") > 0, BAD).otherwise(GOOD))

    df = clock(
        "3_ppl_stage",
        lambda: perplexity_outlier_check(
            df,
            group_col="host",
            threshold=cfg.ppl_threshold,
            num_min=cfg.ppl_num_min,
            num_iterations=cfg.ppl_iterations,
            valid_max=cfg.ppl_valid_max,
            id_col="_row_id",
        ),
    )
    df = df.withColumn(
        "reasons",
        F.when(
            (F.col("flags") != GOOD) & (F.size("reasons") == 0),
            F.array(F.lit("ppl_outlier")),
        ).otherwise(F.col("reasons")),
    )
    out = df.withColumn("keep", F.col("flags") == GOOD).drop("_row_id")
    clock(
        "4_final_materialize",
        lambda: materialize(
            out.select("url", "flags", "keep", "reasons", "scrubbed_text")
        ),
    )
    t["total"] = round(sum(v for k, v in t.items()), 3)
    return t


def main() -> None:
    print("steal:", steal_pct())
    spark = get_spark(
        "qc_stage_profile", master=f"local[{CPUS}]", shuffle_partitions=max(8, CPUS)
    )
    cfg = QualityFilterConfig()
    PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]
    warm = generate_pages(spark, 2000, seed=7).select(PAGE_COLS).cache()
    warm.count()
    run_staged(warm, cfg)
    warm.unpersist()

    pages = generate_pages(spark, QC_DOCS, seed=42).select(PAGE_COLS).cache()
    pages.count()

    def _persistent_rdds(sc):
        out = {}
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            kv = it.next()
            out[int(kv._1())] = kv._2()
        return out

    for i in range(4):
        before = set(_persistent_rdds(spark.sparkContext))
        print(f"trial {i}:", run_staged(pages, cfg))
        after = _persistent_rdds(spark.sparkContext)
        for rdd_id, rdd in after.items():
            if rdd_id not in before:
                rdd.unpersist(True)
    print("steal:", steal_pct())
    spark.stop()


if __name__ == "__main__":
    main()
