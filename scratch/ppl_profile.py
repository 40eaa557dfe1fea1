"""Sub-step timing of perplexity_outlier_check at the bench config —
replica of the function body with clocks around every action."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import materialize, steal_pct  # noqa: E402
from titanlib_spark.flags import BAD, GOOD, apply_check_flags, ensure_flags  # noqa: E402
from titanlib_spark.session import get_spark  # noqa: E402
from titanlib_spark.webtext.generate import generate_pages  # noqa: E402
from titanlib_spark.webtext.pipeline import QualityFilterConfig, run_quality_pipeline  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QC_DOCS = int(os.environ.get("SPARK_GRAFT_QC_DOCS", "20000"))


def ppl_staged(df, group_col="host", threshold=6.0, num_min=10,
               num_iterations=5, ppl_col="ppl", flag_col="flags",
               valid_max=4.2, id_col="_row_id"):
    C = []

    def clock(name, fn):
        t0 = time.time()
        out = fn()
        C.append((name, round(time.time() - t0, 3)))
        return out

    df = ensure_flags(df, flag_col)
    slim = clock("slim_ckpt", lambda: df.select(
        F.col(id_col).alias("_pid"), F.col(group_col), F.col(ppl_col),
        F.col(flag_col), F.col(flag_col).alias("_flag0"),
    ).localCheckpoint(eager=True))
    prev_bad = clock("prev_bad", lambda: slim.where(F.col(flag_col) != GOOD).count())

    n_hosts = None
    for it in range(int(num_iterations)):
        good = slim.where((F.col(flag_col) == GOOD) & F.col(ppl_col).isNotNull())
        stats = clock(f"i{it}_stats_ckpt", lambda: (
            good.rollup(group_col).agg(
                F.expr(f"percentile({ppl_col}, 0.5)").alias("_h_mu"),
                (F.expr(f"percentile({ppl_col}, 0.75)")
                 - F.expr(f"percentile({ppl_col}, 0.25)")).alias("_h_iqr"),
                F.count(F.lit(1)).alias("_h_n"),
            ).localCheckpoint(eager=True)))
        global_row = clock(f"i{it}_global_first",
                           lambda: stats.where(F.col(group_col).isNull()).first())
        g_mu, g_iqr, g_n = global_row["_h_mu"], global_row["_h_iqr"], global_row["_h_n"]
        host_stats = stats.where(F.col(group_col).isNotNull())
        if n_hosts is None:
            n_hosts = clock(f"i{it}_nhosts", host_stats.count)
        if n_hosts <= 2_000_000:
            host_stats = F.broadcast(host_stats)
        joined = slim.join(host_stats, on=group_col, how="left")
        use_host = F.col("_h_n").isNotNull() & (F.col("_h_n") >= int(num_min))
        mu = F.when(use_host, F.col("_h_mu")).otherwise(F.lit(float(g_mu)))
        iqr = F.when(use_host, F.col("_h_iqr")).otherwise(F.lit(float(g_iqr or 0.0)))
        n = F.when(use_host, F.col("_h_n")).otherwise(F.lit(int(g_n)))
        denom = iqr + iqr / F.sqrt(n.cast("double"))
        z = (F.col(ppl_col) - mu) / F.when(denom > 1e-9, denom).otherwise(F.lit(0.25))
        verdict = F.col(ppl_col).isNotNull() & (z > float(threshold))
        if valid_max is not None:
            verdict = verdict & (F.col(ppl_col) > float(valid_max))
        new_slim = apply_check_flags(
            joined, F.when(verdict, BAD).otherwise(GOOD), flag_col
        ).drop("_h_mu", "_h_iqr", "_h_n")
        new_slim = clock(f"i{it}_newslim_ckpt",
                         lambda: new_slim.localCheckpoint(eager=True))
        new_bad = clock(f"i{it}_newbad",
                        lambda: new_slim.where(F.col(flag_col) != GOOD).count())
        slim.unpersist()
        stats.unpersist()
        slim = new_slim
        if new_bad == prev_bad:
            break
        prev_bad = new_bad
    return C


def main() -> None:
    print("steal:", steal_pct())
    spark = get_spark("ppl_profile", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    cfg = QualityFilterConfig()
    PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]
    warm = generate_pages(spark, 2000, seed=7).select(PAGE_COLS).cache()
    warm.count()
    materialize(run_quality_pipeline(warm, cfg).select("url", "keep"))
    warm.unpersist()

    pages = generate_pages(spark, QC_DOCS, seed=42).select(PAGE_COLS).cache()
    pages.count()

    from titanlib_spark.webtext.features import with_fused_features
    from titanlib_spark.webtext.pipeline import _rule_columns, host_of

    for trial in range(4):
        df = pages.withColumn("host", host_of("url"))
        df = with_fused_features(df, text_col="text", html_col="html")
        df = df.drop("text", "html")
        df = df.withColumn("_row_id", F.monotonically_increasing_id())
        df = df.localCheckpoint(eager=True)
        rules = _rule_columns(cfg)
        df = df.withColumn("is_duplicate", F.lit(False))
        reasons = F.array_compact(
            F.array(*[F.when(cond, F.lit(name)) for name, cond in rules.items()])
        )
        df = df.withColumn("reasons", reasons)
        df = ensure_flags(df)
        df = apply_check_flags(df, F.when(F.size("reasons") > 0, BAD).otherwise(GOOD))
        C = ppl_staged(df)
        print(f"trial {trial}: total={sum(v for _, v in C):.3f}", dict(C))
    print("steal:", steal_pct())
    spark.stop()


if __name__ == "__main__":
    main()
