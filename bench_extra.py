"""Per-query isolation bench (guide §1.4): noop-sink timing of named
queries() entries at an arbitrary SF dir, plus .explain("formatted") dumps.

Usage:
    python bench_extra.py [--sf DIR] [--trials N] [--explain-dir DIR] name...

Separate from the FROZEN bench.py on purpose: this is the measurement
scratchpad for OPTIMIZATION_r06.md; bench.py stays the driver contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from bench import _stat_snap, window_steal  # noqa: E402
from titanlib_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "titanlib_spark_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
    )
    qs = entry.queries()

    def _persistent_rdds(sc):
        out = {}
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            kv = it.next()
            out[int(kv._1())] = kv._2()
        return out

    snap0 = _stat_snap()
    results = {}
    for name in args.names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            plan = qs[name](spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        trials = []
        for _ in range(args.trials):
            before = set(_persistent_rdds(spark.sparkContext))
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            materialize(qs[name](spark, args.sf))
            trials.append(round(time.time() - t0, 3))
            for rdd_id, rdd in _persistent_rdds(spark.sparkContext).items():
                if rdd_id not in before:
                    rdd.unpersist(True)
        results[name] = {"trials": trials, "min": min(trials)}
        print(json.dumps({name: results[name]}), flush=True)
    contention = window_steal(snap0, _stat_snap())
    print(json.dumps({"sf": args.sf, "cpus": cpus, **contention, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
