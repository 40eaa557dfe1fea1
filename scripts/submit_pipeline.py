"""spark-submit entrypoint for the webtext quality-filter pipeline.

North-rule deployment surface: "runs via spark-submit --py-files on
multi-executor clusters at N and 4N executors". Package the library and
submit this script — the session comes from spark-submit's conf, so the
same command line moves between local[k], YARN, and Kubernetes:

    cd /root/repo && zip -qr /tmp/titanlib_spark.zip titanlib_spark
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/titanlib_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        scripts/submit_pipeline.py \
        --input /data/pages.parquet --output /data/pages_qc \
        --n-parts 4096

Reruns are resumable: completed salted partitions are recorded in the
output's `_progress` table and skipped on the next invocation (see
titanlib_spark/webtext/checkpoint.py). `--generate N` synthesizes a
deterministic N-page corpus instead of reading `--input` — the smoke-run
mode used by tests and cluster shakedowns (no external data needed).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages table path (url, warc_ts, html, text, lang)")
    src.add_argument("--generate", type=int, metavar="N",
                     help="synthesize N deterministic pages instead of reading --input")
    p.add_argument("--output", required=True, help="output directory (pages_qc + _progress)")
    p.add_argument("--input-format", default="parquet",
                   help="input format: parquet|json|csv|iceberg (default parquet)")
    p.add_argument("--output-format", default="parquet",
                   help="output format: parquet (default) or iceberg on a configured catalog")
    p.add_argument("--n-parts", type=int, default=64,
                   help="salted output partitions; size for ~128-512MB files at your scale")
    p.add_argument("--run-id", default=None, help="lineage run id (default: random)")
    p.add_argument("--ppl-iterations", type=int, default=5)
    p.add_argument("--no-ppl", action="store_true",
                   help="skip the perplexity outlier stage")
    p.add_argument("--allowed-langs", default="en,de,fr,es")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    # spark-submit owns master/conf; builder.getOrCreate() attaches to it.
    # Import AFTER argparse so --help works without a JVM.
    from pyspark.sql import SparkSession

    from titanlib_spark.sources.io import read_pages
    from titanlib_spark.webtext.checkpoint import run_partitioned
    from titanlib_spark.webtext.generate import generate_pages
    from titanlib_spark.webtext.pipeline import QualityFilterConfig

    spark = SparkSession.builder.appName("titanlib-spark-quality-filter").getOrCreate()
    if args.generate is not None:
        pages = generate_pages(spark, args.generate, seed=42).select(
            "url", "warc_ts", "html", "text", "lang"
        )
    else:
        pages = read_pages(spark, args.input, fmt=args.input_format)

    cfg = QualityFilterConfig(
        ppl_iterations=args.ppl_iterations,
        run_ppl_stage=not args.no_ppl,
        allowed_langs=tuple(s for s in args.allowed_langs.split(",") if s),
    )
    summary = run_partitioned(
        spark,
        pages,
        args.output,
        n_parts=args.n_parts,
        cfg=cfg,
        run_id=args.run_id,
        output_format=args.output_format,
    )
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
