"""A/B: streaming MinHash signature — pandas UDF (per-shingle hashlib.md5
in a Python loop, vectorized permutation math) vs the row-local JVM HOF
twin (one md5 per shingle via transform, k interpreted aggregate
min-folds). Same math by construction; this script verifies bit-identical
signatures on a sample and times both at N docs on local[32].

Run: PYTHONPATH=. python scripts/streaming_sig_ab.py [n_docs]
"""
import sys
import time

from pyspark.sql import functions as F

from titanlib_spark.session import get_spark
from titanlib_spark.streaming.near_dedup import minhash_sig_column, minhash_sig_udf
from titanlib_spark.webtext.generate import generate_pages

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

def main():
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    sc = spark.sparkContext
    pages = generate_pages(spark, N, seed=42).select("url", "text").cache()
    pages.count()

    udf_sig = minhash_sig_udf()(F.col("text"))
    col_sig = minhash_sig_column("text")

    # bit-identical on a 2k-doc sample
    sample = pages.limit(2000)
    diff = (
        sample.select(udf_sig.alias("a"), col_sig.alias("b"))
        .where(
            ~(F.col("a").isNull() & F.col("b").isNull())
            & ((F.col("a").isNull() != F.col("b").isNull()) | (F.col("a") != F.col("b")))
        )
        .count()
    )
    assert diff == 0, f"{diff} mismatching signatures"
    print(f"IDENTICAL on 2000-doc sample")

    def bench(expr, label):
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            pages.select(expr.alias("sig")).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        print(f"{label}: best {best:.2f}s = {N / best:,.0f} docs/s")
        return best

    u = bench(udf_sig, f"pandas UDF  ({N} docs)")
    c = bench(col_sig, f"JVM HOF     ({N} docs)")
    print(f"winner: {'UDF' if u < c else 'JVM HOF'} ({max(u, c) / min(u, c):.2f}x)")
    spark.stop()

if __name__ == "__main__":
    main()
