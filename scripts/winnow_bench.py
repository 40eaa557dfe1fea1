"""Scale bench: winnowed passage dedup (duplicate_passage_pairs) at N docs
with a boilerplate-heavy corpus that exercises the max_bucket truncation.

Corpus (deterministic, generated Spark-side, no driver loop):
* 30% of docs carry the SAME 15-token boilerplate sentence -> its
  fingerprints live in buckets of ~0.3N docs, far above max_bucket=1000;
  without truncation the bucket self-join would be ~ (0.3N)^2 pairs.
* docs (2g, 2g+1) for g % 100 == 0 share a unique 15-token passage
  (>= w+k-1 = 11 tokens -> the winnowing guarantee applies): these are
  the true pairs the gate must emit.
* ~40 unique filler tokens per doc.

One op per JVM (CLAUDE.md rule 17). Prints one JSON line with wall,
docs/s, emitted pairs, recall of designed pairs, and a steal stamp.

Run: PYTHONPATH=. python scripts/winnow_bench.py [n_docs]
"""
import json
import sys
import time

from pyspark.sql import functions as F

from titanlib_spark.session import get_spark
from titanlib_spark.textops.dedup import duplicate_passage_pairs

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def _stat_snap():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7]


def main():
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    snap0 = _stat_snap()

    ids = spark.range(0, N, numPartitions=64).select(F.col("id").alias("doc_id"))
    filler = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.concat(F.lit("u"), (F.col("doc_id") * 40 + i).cast("string")),
        ),
    )
    boiler = F.lit(
        "subscribe to our newsletter for the latest updates and exclusive "
        "offers delivered straight to your inbox every week"
    )
    grp = (F.col("doc_id") / 2).cast("long")
    passage = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(15)),
            lambda i: F.concat(F.lit("p"), grp.cast("string"), F.lit("x"), i.cast("string")),
        ),
    )
    text = F.concat_ws(
        " ",
        F.when(F.col("doc_id") % 10 < 3, boiler).otherwise(F.lit("")),
        F.when(grp % 100 == 0, passage).otherwise(F.lit("")),
        filler,
    )
    docs = ids.withColumn("text", text).localCheckpoint(eager=True)
    n = docs.count()

    t0 = time.monotonic()
    pairs = duplicate_passage_pairs(docs, max_bucket=1000)
    n_pairs = pairs.count()
    wall = time.monotonic() - t0

    designed = N // 200  # (2g, 2g+1) for g % 100 == 0
    hits = pairs.where(
        (F.col("id_b") == F.col("id_a") + 1)
        & (F.col("id_a") % 2 == 0)
        & ((F.col("id_a") / 2).cast("long") % 100 == 0)
    ).count()
    snap1 = _stat_snap()
    steal = round(100.0 * (snap1[1] - snap0[1]) / max(snap1[0] - snap0[0], 1), 2)
    print(json.dumps({
        "metric": "winnow_dup_passages",
        "n_docs": n,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "pairs_emitted": n_pairs,
        "designed_pairs": designed,
        "designed_found": hits,
        "recall": round(hits / designed, 4) if designed else None,
        "steal_pct": steal,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
