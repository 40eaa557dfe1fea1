import time, sys
sys.path.insert(0, "/root/repo")
from titanlib_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark("annp2", master="local[32]")
sc = spark.sparkContext
qs = e.queries()
out = open("/tmp/annp2.txt", "a")

def persistent_rdds():
    out = {}
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        kv = it.next(); out[int(kv._1())] = kv._2()
    return out

def scoped(name):
    before = set(persistent_rdds())
    t0 = time.time()
    qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    for rid, rdd in persistent_rdds().items():
        if rid not in before: rdd.unpersist(True)
    return dt

for i in range(2):
    print(f"RES lsh t{i}: {scoped('ngram_jaccard_lsh'):.2f}s", file=out, flush=True)
for q in ["embedding_near_dups", "ann_topk"]:
    for i in range(2):
        print(f"RES {q} t{i}: {scoped(q):.2f}s", file=out, flush=True)
spark.stop()
