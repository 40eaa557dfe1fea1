import time, sys
sys.path.insert(0, "/root/repo")
from titanlib_spark.session import get_spark
import __spark_entry__ as e

spark = get_spark("wtq", master="local[32]")
qs = e.queries()
for name in ["tpch_q1", "wt_token_counts", "wt_quality_features", "wt_scrub",
             "wt_pipeline", "isolation_check", "buddy_check", "fgt", "dup_exact"]:
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"RES {name}: {best:.2f}s", file=open("/tmp/wtq.txt", "a"))
spark.stop()
