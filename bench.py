"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also times the flagship webtext quality pipeline on a generated page table
(docs/sec is the north-star throughput metric). Scaling-efficiency runs
(local[8] vs local[32]) are driven by scripts/scaling_bench.py, which
shells out to this file at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from titanlib_spark.session import get_spark  # noqa: E402
from titanlib_spark.webtext.generate import generate_pages  # noqa: E402
from titanlib_spark.webtext.pipeline import QualityFilterConfig, run_quality_pipeline  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QC_DOCS = int(os.environ.get("SPARK_GRAFT_QC_DOCS", "20000"))
QC_TRIALS = int(os.environ.get("SPARK_GRAFT_QC_TRIALS", "4"))

# headline subset: scans/aggs/joins + one member of each QC family +
# webtext/text-ops (minhash/sct excluded here: benchmarked via tests;
# they dominate wall time without adding signal at this sf)
HEADLINE = [
    "tpch_q1",
    "orders_by_nation",
    "events_hourly",
    "range_check",
    "metadata_check",
    "isolation_check",
    "buddy_check",
    "fgt",
    "dup_exact",
    "wt_token_counts",
    "wt_quality_features",
    "wt_scrub",
    "wt_pipeline",
    # the 100 TB dedup composition (LSH-gated exact verify) — the unbounded
    # exact ngram_jaccard stays as the sf<=0.01 oracle verifier only
    "ngram_jaccard_lsh",
    "embedding_near_dups",
    "ann_topk",
]


def materialize(df) -> int:
    """Force full execution without driver-side row transfer."""
    return df.write.format("noop").mode("overwrite").save() or 0


def _stat_snap():
    """Cumulative (total, steal, iowait) jiffies from /proc/stat line 1."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7], vals[4]


def steal_pct(seconds: float = 2.0) -> float:
    """Hypervisor steal fraction over a short probe window."""
    t0, s0, _ = _stat_snap()
    time.sleep(seconds)
    t1, s1, _ = _stat_snap()
    return round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)


def window_steal(snap0, snap1) -> dict:
    """Steal/iowait fraction over an arbitrary window, from two cumulative
    snapshots — catches contention ANYWHERE in the run, which short
    endpoint probes miss (observed: clean endpoints around a run whose
    first trial was 7x inflated). This box's slowdowns also include
    host-level memory-bandwidth contention that registers NOWHERE in
    /proc/stat, so even steal_clean=true only rules one mechanism out;
    per-trial times (qc_trials_sec) are the honest variance record
    (CLAUDE.md rule 13)."""
    dt = max(snap1[0] - snap0[0], 1)
    return {
        "steal_pct": round(100.0 * (snap1[1] - snap0[1]) / dt, 2),
        "iowait_pct": round(100.0 * (snap1[2] - snap0[2]) / dt, 2),
    }


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    snap0 = _stat_snap()
    # pin the initial heap to the max ONLY for big (scaling-bench) runs:
    # an unpinned 48g heap grows across the first multi-million-doc trial
    # through repeated full GCs (r3 scaling runs: local[8] 150/134/99s at
    # 0.9% steal). At sf0.1 the pin is pure poison — first-touch minor
    # faults on the huge fresh Eden land INSIDE the measured windows
    # (r5 adjudication: ngram_jaccard_lsh 4.7s unpinned vs 24-61s pinned,
    # with a GC log showing a 61s trial containing ZERO gc events — the
    # time is page-fault serialization, not collection)
    extra_java = "-Xms48g" if QC_DOCS >= 200_000 else ""
    spark = get_spark(
        "titanlib_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS),
        extra_conf=(
            {"spark.driver.extraJavaOptions": extra_java} if extra_java else None
        ),
    )

    def _persistent_rdds(sc):
        out = {}
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            kv = it.next()
            out[int(kv._1())] = kv._2()
        return out

    def _scoped(fn):
        """Run fn, then free any checkpoint/cache blocks it left behind:
        dead localCheckpoint blocks from earlier queries squeeze execution
        memory and poison later ones (CLAUDE.md rule 17)."""
        before = set(_persistent_rdds(spark.sparkContext))
        t0 = time.time()
        fn()
        dt = time.time() - t0
        for rdd_id, rdd in _persistent_rdds(spark.sparkContext).items():
            if rdd_id not in before:
                rdd.unpersist(True)
        return dt

    qs = entry.queries()
    times: dict[str, float] = {}

    def run_headline():
        # best-of-2 steady state per query (same policy as the pipeline
        # warm-up below and scripts/spatial_bench.py): the first execution
        # of a large plan pays one-time JIT/whole-stage-codegen compilation
        # (~60s for the 64-min-aggregate minhash stage) that a long-lived
        # cluster amortizes away
        for name in HEADLINE:
            trials_q = [
                _scoped(lambda: materialize(qs[name](spark, SF_DIR)))
                for _ in range(2)
            ]
            # adaptive third trial: when the two disagree by >30% the
            # window was dirty (transient in-VM contention that registers
            # nowhere in /proc/stat — CLAUDE.md rule 13); one more sample
            # makes a clean window likely without tripling the whole run
            if max(trials_q) > 1.3 * min(trials_q):
                trials_q.append(
                    _scoped(lambda: materialize(qs[name](spark, SF_DIR)))
                )
            times[name] = round(min(trials_q), 3)
        # settle barrier: the 16 queries leave dead broadcast variables
        # (ContextCleaner reclaims them only after a driver GC) and a
        # full allocation debt in the pinned 48g heap — without this the
        # qc section absorbs their GC pauses and storage pressure
        # (r04: qc-last read 4.5-7.1s vs 2.4-2.8s standalone, clean steal)
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    qc_first = os.environ.get("SPARK_GRAFT_QC_FIRST") == "1"
    skip_headline = os.environ.get("SPARK_GRAFT_SKIP_HEADLINE") == "1"
    if not skip_headline and not qc_first:
        run_headline()

    # flagship: webtext QC pipeline docs/sec (generation excluded via cache).
    # One warm-up pass first: the cold run pays ~60-70s of one-time JVM
    # JIT/codegen + python-worker spin-up that a long-lived cluster
    # amortizes away; steady-state throughput is the comparable number.
    # production input shape only — the generator's expected_* label
    # columns would otherwise ride through every shuffle and checkpoint
    # (expected_scrubbed_text alone doubles the payload)
    PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]
    # warm-up scales with the input: a 2k-doc pass leaves python worker
    # pools, memory arenas and checkpoint storage cold at multi-million-doc
    # scale, so the first big trial still absorbed ~40% warm-up inflation
    # (measured: monotone-decreasing trials at 0.5% steal; a 100k-capped
    # warm-up left 2M-doc trials still warming through trial 2, and a
    # QC_DOCS//4 warm-up left 20k trials monotone [5.5, 4.2, 3.0] in r05).
    # Full-size warm-up, capped only at 500k where arena/worker state has
    # plateaued
    warm_docs = max(2000, min(500_000, QC_DOCS))
    warm = generate_pages(spark, warm_docs, seed=7).select(PAGE_COLS).cache()
    warm.count()
    _scoped(lambda: materialize(
        run_quality_pipeline(warm, QualityFilterConfig()).select(
            "url", "flags", "keep", "reasons", "scrubbed_text"
        )
    ))
    warm.unpersist()

    pages = generate_pages(spark, QC_DOCS, seed=42).select(PAGE_COLS).cache()
    pages.count()
    # settle the warm-up's allocation debt before the measured window
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)

    trials = []
    for _ in range(QC_TRIALS):  # best-of-N: transient in-VM contention (which does
        # NOT register as hypervisor steal) inflates single trials 3-5x;
        # three trials make at least one clean window likely
        # free the previous trial's internal checkpoints (NOT the pages
        # cache): dead blocks squeeze execution memory and poison the
        # second trial (CLAUDE.md rule 17)
        before = set(_persistent_rdds(spark.sparkContext))
        if os.environ.get("SPARK_GRAFT_QC_DEBUG") == "1":
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            print(
                f"QCDBG pre-trial storage: {len(infos)} rdds "
                f"{sum(i.memSize() for i in infos)/1e6:.1f} MB",
                file=sys.stderr,
            )
        t0 = time.time()
        result = run_quality_pipeline(pages, QualityFilterConfig())
        materialize(result.select("url", "flags", "keep", "reasons", "scrubbed_text"))
        trials.append(time.time() - t0)
        after = _persistent_rdds(spark.sparkContext)
        for rdd_id, rdd in after.items():
            if rdd_id not in before:
                rdd.unpersist(True)
        # settle the heap between trials: the freed checkpoint blocks and
        # the trial's allocation debt otherwise land as GC pauses INSIDE
        # the next trial's window (local[2] trials drifted 289->342s)
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
    qc_sec = min(trials)
    times["webtext_qc_pipeline"] = round(qc_sec, 3)
    pages.unpersist()
    if not skip_headline and qc_first:
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        run_headline()

    total = round(sum(times.values()), 3)
    contention = window_steal(snap0, _stat_snap())
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": CPUS,
                "qc_docs": QC_DOCS,
                "qc_docs_per_sec": round(QC_DOCS / qc_sec, 1),
                "qc_trials_sec": [round(x, 3) for x in trials],
                # contention stamp over the WHOLE run: numbers taken at
                # steal > 2% are box noise, not engine measurements
                # (CLAUDE.md rule 13)
                "steal_pct": contention["steal_pct"],
                "iowait_pct": contention["iowait_pct"],
                "steal_clean": bool(contention["steal_pct"] <= 2.0),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
