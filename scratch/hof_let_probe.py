import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from titanlib_spark.session import get_spark

spark = get_spark("hof_probe", master="local[4]", shuffle_partitions=8)
d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").coalesce(1).cache()
d.count()

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def t(label, col, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.time(); noop(d.select("doc_id", col.alias("_g"))); best = min(best, time.time()-t0)
    print(f"{label}: {best:.2f}s", file=open("/tmp/hof_probe.txt","a"))

n = 3
text = F.col("text")
toks = F.split(F.lower(F.trim(text)), r"\s+")

# current: outer-expr refs inside lambda
idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
cur = F.when(F.size(toks) >= n, F.array_distinct(F.transform(
    idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
))).otherwise(F.array().cast("array<string>"))
t("word_ngrams current", cur)

# let-bound: toks bound once as outer lambda var
def grams_of(W):
    ix = F.sequence(F.lit(1), F.size(W) - (n - 1))
    return F.when(F.size(W) >= n, F.array_distinct(F.transform(
        ix, lambda i: F.concat_ws(" ", *[F.element_at(W, i + j) for j in range(n)])
    ))).otherwise(F.array().cast("array<string>"))
let = F.element_at(F.transform(F.array(toks), grams_of), 1)
t("word_ngrams let-bound", let)

# char shingles current vs let-bound (n=5)
tl = F.lower(text)
idx5 = F.sequence(F.lit(1), F.length(tl) - 4)
cur5 = F.when(F.length(tl) >= 5, F.array_distinct(F.transform(idx5, lambda i: F.substring(tl, i, 5)))).otherwise(F.array().cast("array<string>"))
t("char_shingles current", cur5)

def sh_of(s):
    ix = F.sequence(F.lit(1), F.length(s) - 4)
    return F.when(F.length(s) >= 5, F.array_distinct(F.transform(ix, lambda i: s.substr(i, F.lit(5))))).otherwise(F.array().cast("array<string>"))
let5 = F.element_at(F.transform(F.array(tl), sh_of), 1)
t("char_shingles let-bound", let5)
spark.stop()
