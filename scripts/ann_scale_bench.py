"""ANN scale bench (r06, VERDICT r05 item 6): 1e6 embeddings.

- ann_topk_ivf at k=10 (nprobe=4/16 coarse cells, 10k-sample k-means):
  wall + recall vs the exact brute-force top-k.
- embedding_near_dup_pairs at the realistic 0.95 threshold with planted
  clones (the q_embedding_near_dups construction): wall + found-pair
  count vs planted count (gate recall).

Usage: python scripts/ann_scale_bench.py [--vectors N]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _stat_snap, materialize, window_steal  # noqa: E402
from titanlib_spark.session import get_spark  # noqa: E402

QUERY_VEC = [round(math.sin(i + 1), 4) for i in range(64)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "ann_scale_bench", master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
    )
    snap0 = _stat_snap()

    from titanlib_spark.textops import cosine_topk, ivf_topk
    from titanlib_spark.textops.similarity import embedding_near_dup_pairs

    n = args.vectors
    # deterministic normal(0, 0.125) vectors, same shape as the harness
    # embeddings table; generated distributed
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(int(i))
                rows.append(rng.normal(0, 0.125, 64).astype(float).tolist())
            yield pd.DataFrame({"vec_id": ids, "emb_d": rows})

    e = (
        spark.range(0, n, numPartitions=max(32, n // 50_000))
        .mapInPandas(gen, "vec_id long, emb_d array<double>")
        .cache()
    )
    e.count()

    t0 = time.time()
    exact = cosine_topk(e, QUERY_VEC, k=10, vec_col="emb_d", id_col="vec_id")
    exact_ids = {r["vec_id"] for r in exact.collect()}
    t_exact = time.time() - t0
    print(f"isotropic {n}: exact scan {t_exact:.2f}s", flush=True)

    for nprobe in (4, 8, 12):
        t0 = time.time()
        ivf = ivf_topk(
            e, QUERY_VEC, k=10, nprobe=nprobe, n_centroids=16, sample=10_000,
            iters=10, seed=7, vec_col="emb_d", id_col="vec_id",
        )
        ivf_ids = {r["vec_id"] for r in ivf.collect()}
        t_ivf = time.time() - t0
        recall = len(ivf_ids & exact_ids) / 10.0
        print(
            f"  ivf nprobe={nprobe}/16: {t_ivf:.2f}s recall@10 {recall:.2f}",
            flush=True,
        )

    # clustered corpus (the regime IVF is FOR): vectors around 16 seeded
    # centroids + noise; query = centroid 3 + noise
    def gen_clustered(batches):
        import pandas as pd

        cents = np.random.default_rng(99).normal(0, 1.0, (16, 64))
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(int(i) + 1_000_000_007)
                c = cents[int(i) % 16]
                rows.append((c + rng.normal(0, 0.35, 64)).astype(float).tolist())
            yield pd.DataFrame({"vec_id": ids, "emb_d": rows})

    ec = (
        spark.range(0, n, numPartitions=max(32, n // 50_000))
        .mapInPandas(gen_clustered, "vec_id long, emb_d array<double>")
        .cache()
    )
    ec.count()
    qvec = (
        np.random.default_rng(99).normal(0, 1.0, (16, 64))[3]
        + np.random.default_rng(5).normal(0, 0.1, 64)
    ).tolist()
    t0 = time.time()
    exact_c = {r["vec_id"] for r in cosine_topk(
        ec, qvec, k=10, vec_col="emb_d", id_col="vec_id").collect()}
    t_exact_c = time.time() - t0
    for nprobe in (2, 4):
        t0 = time.time()
        ivf_ids = {r["vec_id"] for r in ivf_topk(
            ec, qvec, k=10, nprobe=nprobe, n_centroids=16, sample=10_000,
            iters=10, seed=7, vec_col="emb_d", id_col="vec_id").collect()}
        t_ivf = time.time() - t0
        print(
            f"clustered {n}: exact {t_exact_c:.2f}s ivf nprobe={nprobe}/16 "
            f"{t_ivf:.2f}s recall@10 {len(ivf_ids & exact_c) / 10.0:.2f}",
            flush=True,
        )
    ec.unpersist()

    # near-dups: plant clones on every 100th vector (10k clones at 1e6)
    clones = e.where(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + F.lit(100_000_000)).alias("vec_id"),
        F.concat(
            F.array(F.element_at("emb_d", 1) + F.lit(0.25)),
            F.slice("emb_d", 2, 63),
        ).alias("emb_d"),
    )
    allv = e.select("vec_id", "emb_d").unionByName(clones)
    n_planted = n // 100
    # scale-appropriate gate: random-pair collision at L tables of P
    # planes is ~L * 0.5^P of n^2/2 pairs — the harness's 16/16 gate
    # (2.4e-4) yields ~120M candidates at 1e6 vectors and fills local
    # disk with verify-join spill (measured; that run is the motivation
    # for exposing the levers). 24 planes / 32 tables keeps clone-pair
    # recall ~1.0 (per-plane agreement 0.986 at cos 0.999) while pruning
    # random pairs to ~1.9e-6 (~1M candidates).
    t0 = time.time()
    pairs = embedding_near_dup_pairs(
        allv, threshold=0.95, vec_col="emb_d", id_col="vec_id",
        n_planes=24, dim=64, n_tables=32, seed=7,
    )
    found = pairs.count()
    t_nd = time.time() - t0
    print(
        f"near-dups {n}(+{n_planted} clones, 24/32 gate): {t_nd:.2f}s "
        f"found {found} pairs (planted {n_planted}; gate recall "
        f"{min(found, n_planted) / n_planted:.3f})"
    )
    print("steal over run:", window_steal(snap0, _stat_snap()))
    spark.stop()


if __name__ == "__main__":
    main()
