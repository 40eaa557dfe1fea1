"""A/B the two dedup strategies of run_quality_pipeline in one JVM."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import materialize, steal_pct
from titanlib_spark.session import get_spark
from titanlib_spark.webtext.generate import generate_pages
from titanlib_spark.webtext.pipeline import QualityFilterConfig, run_quality_pipeline

CPUS = 32
spark = get_spark("qc_ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]
pages = generate_pages(spark, 20000, seed=42).select(PAGE_COLS).cache()
pages.count()

def _rdds(sc):
    out = {}
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        kv = it.next(); out[int(kv._1())] = kv._2()
    return out

def trial(cfg):
    before = set(_rdds(spark.sparkContext))
    t0 = time.time()
    out = run_quality_pipeline(pages, cfg)
    materialize(out.select("url", "flags", "keep", "reasons", "scrubbed_text"))
    dt = time.time() - t0
    after = _rdds(spark.sparkContext)
    for rid, rdd in after.items():
        if rid not in before:
            rdd.unpersist(True)
    return round(dt, 3)

small = QualityFilterConfig()                       # single-window path
big = QualityFilterConfig(small_input_rows=0)       # slim+broadcast path
trial(small); trial(big)  # warm both plans
for name, cfg in (("window", small), ("broadcast", big), ("window", small), ("broadcast", big), ("window", small), ("broadcast", big)):
    print(name, trial(cfg), "steal", round(steal_pct(0.5), 2))
spark.stop()
