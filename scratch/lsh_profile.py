import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from titanlib_spark.session import get_spark
from titanlib_spark.textops.dedup import (
    word_ngrams, minhash_signatures, minhash_lsh_candidates, ngram_jaccard_pairs_lsh)

spark = get_spark("lsh_prof", master="local[32]")
d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
print("docs:", d.count())
d.selectExpr("avg(length(text)) as avg_len", "max(length(text)) as max_len").show()

def t(label, fn, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    print(f"{label}: {best:.2f}s")

# stage A: grams checkpoint
grams = None
def mk_grams():
    global grams
    g = d.select(F.col("doc_id"), word_ngrams("text", 3).alias("_g")).localCheckpoint(eager=True)
    grams = g
t("grams localCheckpoint", mk_grams)

# stage B: signatures (md5 mode, 64 hashes)
sigs = minhash_signatures(grams, "_g", 64, id_col="doc_id", hash_fn="md5",
                          gram_fn=lambda t: F.col("_g"), signatures_only=True)
t("sigs md5 (noop write)", lambda: sigs.write.format("noop").mode("overwrite").save())

# stage B': signatures xxhash64 for comparison
sigs_x = minhash_signatures(grams, "_g", 64, id_col="doc_id", hash_fn="xxhash64",
                            gram_fn=lambda t: F.col("_g"), signatures_only=True)
t("sigs xxhash64", lambda: sigs_x.write.format("noop").mode("overwrite").save())

# stage C: candidates
cands = minhash_lsh_candidates(sigs, "doc_id", "minhash", 16, 64, hash_fn="md5")
t("sigs+cands", lambda: cands.write.format("noop").mode("overwrite").save())

# full
t("full ngram_jaccard_pairs_lsh", lambda: ngram_jaccard_pairs_lsh(
    d, id_col="doc_id", text_col="text", n=3, threshold=0.2, hash_fn="md5"
).write.format("noop").mode("overwrite").save())
spark.stop()
