import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from titanlib_spark.session import get_spark, spread_small_input
import __spark_entry__ as e
from titanlib_spark.webtext import heuristics as H

spark = get_spark("ab", master="local[32]")
raw = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
spread = spread_small_input(raw)

def feats(d):
    return d.select(
        "doc_id",
        F.round(H.stopword_ratio("text", F.lit("en")), 6).alias("swr"),
        F.round(H.alpha_word_ratio("text"), 6).alias("awr"),
        F.round(H.mean_word_length("text"), 6).alias("mwl"),
        F.round(H.dup_line_frac("text"), 6).alias("dlf"),
    )

out = open("/tmp/ab.txt", "a")
for rnd in range(3):
    for label, d in [("1part", raw), ("spread", spread)]:
        t0 = time.time()
        feats(d).write.format("noop").mode("overwrite").save()
        print(f"RES r{rnd} {label}: {time.time()-t0:.2f}s", file=out, flush=True)
spark.stop()
