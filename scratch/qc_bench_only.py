"""Isolate the webtext_qc_pipeline bench number (the r03 regression
suspect): same protocol as bench.py — warm-up, 20k docs, best-of-2,
scoped checkpoint cleanup — with steal stamps and per-trial times."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize, steal_pct  # noqa: E402
from titanlib_spark.session import get_spark  # noqa: E402
from titanlib_spark.webtext.generate import generate_pages  # noqa: E402
from titanlib_spark.webtext.pipeline import (  # noqa: E402
    QualityFilterConfig,
    run_quality_pipeline,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QC_DOCS = int(os.environ.get("SPARK_GRAFT_QC_DOCS", "20000"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))


def main() -> None:
    st0 = steal_pct()
    spark = get_spark(
        "qc_bench_only", master=f"local[{CPUS}]", shuffle_partitions=max(8, CPUS)
    )
    PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]
    warm = generate_pages(spark, 2000, seed=7).select(PAGE_COLS).cache()
    warm.count()
    materialize(
        run_quality_pipeline(warm, QualityFilterConfig()).select(
            "url", "flags", "keep", "reasons", "scrubbed_text"
        )
    )
    warm.unpersist()

    pages = generate_pages(spark, QC_DOCS, seed=42).select(PAGE_COLS).cache()
    pages.count()

    def _persistent_rdds(sc):
        out = {}
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            kv = it.next()
            out[int(kv._1())] = kv._2()
        return out

    trials = []
    for _ in range(TRIALS):
        before = set(_persistent_rdds(spark.sparkContext))
        t0 = time.time()
        result = run_quality_pipeline(pages, QualityFilterConfig())
        materialize(result.select("url", "flags", "keep", "reasons", "scrubbed_text"))
        trials.append(round(time.time() - t0, 3))
        after = _persistent_rdds(spark.sparkContext)
        for rdd_id, rdd in after.items():
            if rdd_id not in before:
                rdd.unpersist(True)
    st1 = steal_pct()
    print(
        json.dumps(
            {
                "trials_sec": trials,
                "best_sec": min(trials),
                "docs_per_sec": round(QC_DOCS / min(trials), 1),
                "steal_before": st0,
                "steal_after": st1,
                "cpus": CPUS,
                "qc_docs": QC_DOCS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
