import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from titanlib_spark.session import get_spark, spread_small_input
import __spark_entry__ as e

spark = get_spark("embab", master="local[32]")
out = open("/tmp/embab.txt", "a")

# monkey-patch _t to toggle spread
orig_read = spark.read.parquet
def t_raw(spark_, sf, name):
    return spark_.read.parquet(f"{sf}/{name}.parquet")

import __spark_entry__ as entry
qs = entry.queries()

def run(name):
    t0 = time.time()
    qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    return time.time() - t0

import titanlib_spark.session as sess
real_spread = sess.spread_small_input

for rnd in range(3):
    for mode in ["spread", "raw"]:
        sess.spread_small_input = real_spread if mode == "spread" else (lambda df, min_parts=None: df)
        # entry._t references titanlib_spark.session.spread_small_input via import inside fn
        for q in ["embedding_near_dups", "ann_topk"]:
            dt = run(q)
            print(f"RES r{rnd} {mode} {q}: {dt:.2f}s", file=out, flush=True)
sess.spread_small_input = real_spread
spark.stop()
