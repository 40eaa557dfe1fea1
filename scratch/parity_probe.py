"""Probe Spark<->DuckDB expression parity for oracle design decisions."""
import duckdb
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .appName("parity_probe")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

texts = [
    "The quick brown fox jumps over the lazy dog",
    "  leading spaces and\ttabs\nnewlines here  ",
    "email me at foo.bar@example.com or call 555-123-4567 now",
    "der schnelle braune fuchs und so weiter",
    "",
]
df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
df.createOrReplaceTempView("t")

print("=== md5 ===")
print(spark.sql("select id, md5(text) as h from t").collect())
print(duckdb.sql("select i as id, md5(t) as h from (select unnest(range(5)) i, unnest(['%s']) t)" % "','".join(texts.__iter__()) if False else "select 1").fetchall())
con = duckdb.connect()
con.execute("create table t as select * from (values " + ",".join(f"({i}, '{t.replace(chr(39), chr(39)*2)}')" for i, t in enumerate(texts)) + ") v(id, text)")
print(con.sql("select id, md5(text) as h from t").fetchall())

print("=== hex to int ===")
# Spark: conv(substring(md5(x),1,15),16,10) cast bigint
print(spark.sql("select cast(conv(substring(md5(text),1,15),16,10) as bigint) h from t").collect())
for attempt in [
    "select ('0x' || substr(md5(text),1,15))::BIGINT h from t",
    "select from_hex(substr(md5(text),1,15)) h from t",
]:
    try:
        print(attempt, "->", con.sql(attempt).fetchall())
    except Exception as e:
        print(attempt, "FAIL", e)

print("=== split on whitespace ===")
print(spark.sql(r"select id, size(filter(split(trim(text), '\\s+'), x -> x != '')) n from t").collect())
print(con.sql(r"select id, len(list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')) n from t").fetchall())

print("=== percentile exact ===")
vals = [1.0, 2.0, 3.0, 4.0, 10.0]
vdf = spark.createDataFrame([(v,) for v in vals], "v double")
vdf.createOrReplaceTempView("vt")
print(spark.sql("select percentile(v, 0.25) p25, percentile(v, 0.5) p50 from vt").collect())
print(con.sql("select quantile_cont(v, 0.25) p25, quantile_cont(v,0.5) p50 from (select unnest([1.0,2.0,3.0,4.0,10.0]) v)").fetchall())

print("=== var_pop/var_samp ===")
print(spark.sql("select var_pop(v) vp, var_samp(v) vs from vt").collect())
print(con.sql("select var_pop(v) vp, var_samp(v) vs from (select unnest([1.0,2.0,3.0,4.0,10.0]) v)").fetchall())

print("=== regexp_replace global ===")
pat = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
print(spark.sql(f"select regexp_replace(text, '{pat}', '<EMAIL>') s from t where id=2").collect())
print(con.sql(f"select regexp_replace(text, '{pat}', '<EMAIL>', 'g') s from t where id=2").fetchall())

print("=== replace-count occurrences ===")
print(spark.sql("select id, (length(text) - length(replace(text, 'the', ''))) / 3 c from t").collect())
print(con.sql("select id, (length(text) - length(replace(text, 'the', ''))) / 3 c from t order by id").fetchall())

print("=== array ops: repeated lines ===")
print(spark.sql(r"select id, size(split(text, '\\n')) nl, size(array_distinct(split(text, '\\n'))) nd from t").collect())
print(con.sql(r"select id, len(string_split(text, chr(10))) nl, len(list_distinct(string_split(text, chr(10)))) nd from t order by id").fetchall())

print("=== embeddings cosine (list ops) ===")
print(con.sql("select list_cosine_similarity([1.0,2.0,3.0],[3.0,2.0,1.0])").fetchall())
print(spark.sql("""
 select aggregate(zip_with(array(1.0d,2.0d,3.0d), array(3.0d,2.0d,1.0d), (a,b)->a*b), 0d, (acc,x)->acc+x)
  / (sqrt(aggregate(array(1.0d,2.0d,3.0d), 0d, (acc,x)->acc+x*x)) * sqrt(aggregate(array(3.0d,2.0d,1.0d), 0d, (acc,x)->acc+x*x))) c
""").collect())

print("=== timestamp compare ===")
sdf = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
print(sdf.selectExpr("min(ts)", "max(ts)").collect())
print(con.sql("select min(ts), max(ts) from read_parquet('/root/testdata/sf0.001/events.parquet')").fetchall())

spark.stop()
