import time, sys
sys.path.insert(0, "/root/repo")
from titanlib_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark("annp", master="local[32]")
qs = e.queries()
out = open("/tmp/annp.txt", "a")
for q in ["ann_topk", "embedding_near_dups"]:
    for i in range(3):
        t0 = time.time()
        qs[q](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        print(f"RES {q} t{i}: {time.time()-t0:.2f}s", file=out, flush=True)
spark.stop()
