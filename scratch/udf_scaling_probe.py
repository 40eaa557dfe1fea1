"""Scaling diagnosis: time ONLY the fused-UDF stage (the pipeline's
parallel bulk) at a given core count — isolates whether the 4v16
efficiency ceiling lives in the engine's serial structure or in the
Arrow-worker compute itself (memory bandwidth)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import materialize, steal_pct, _stat_snap, window_steal
from titanlib_spark.session import get_spark
from titanlib_spark.webtext.generate import generate_pages
from titanlib_spark.webtext.features import with_fused_features
from titanlib_spark.webtext.pipeline import host_of

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
DOCS = int(os.environ.get("SPARK_GRAFT_QC_DOCS", "2000000"))
spark = get_spark("udf_probe", master=f"local[{CPUS}]", shuffle_partitions=max(8, CPUS))
PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]
pages = generate_pages(spark, DOCS, seed=42).select(PAGE_COLS).cache()
pages.count()
# warm the python worker pool + JIT
materialize(with_fused_features(
    pages.limit(2000).withColumn("host", host_of("url")), text_col="text", html_col="html"
).drop("text", "html"))
snap0 = _stat_snap()
trials = []
for _ in range(2):
    t0 = time.time()
    materialize(with_fused_features(
        pages.withColumn("host", host_of("url")), text_col="text", html_col="html"
    ).drop("text", "html"))
    trials.append(round(time.time() - t0, 2))
print({"cpus": CPUS, "docs": DOCS, "trials": trials, "best": min(trials),
       "docs_per_sec": round(DOCS / min(trials)), **window_steal(snap0, _stat_snap())})
spark.stop()
