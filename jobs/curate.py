"""spark-submit entry point for the training-data curation pipeline.

Runs the standard web-corpus curation chain (Gopher quality + repetition
filters → exact dedup → C4-style line dedup → MinHash-LSH near-dedup via
connected components → PII redaction) and writes the curated corpus plus
one JSON line of per-stage document counts.

Usage (cluster):
    zip -r nativeextractor_spark.zip nativeextractor_spark
    spark-submit --py-files nativeextractor_spark.zip jobs/curate.py \
        --pages <pages table/path> --out <curated parquet path> \
        [--languages en,es] [--no-redact] [--no-near-dedup]

Local smoke:
    python jobs/curate.py --synthetic 500 --out /tmp/curated
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet/Iceberg)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of reading --pages")
    ap.add_argument("--out", required=True, help="curated corpus output path")
    ap.add_argument("--languages", help="comma-separated language allowlist")
    ap.add_argument("--no-quality", action="store_true")
    ap.add_argument("--no-repetition", action="store_true")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--no-line-dedup", action="store_true")
    ap.add_argument("--no-near-dedup", action="store_true")
    ap.add_argument("--no-redact", action="store_true")
    args = ap.parse_args()

    from nativeextractor_spark.session import get_spark
    from nativeextractor_spark.datagen import generate_pages_df
    from nativeextractor_spark.io import read_table, write_table
    from nativeextractor_spark.textops.pipeline import curate_corpus

    spark = get_spark("curate")
    if args.synthetic:
        pages = generate_pages_df(spark, n_pages=args.synthetic)
    elif args.pages:
        pages = read_table(spark, args.pages)
    else:
        ap.error("either --pages or --synthetic is required")

    curated, metrics = curate_corpus(
        pages,
        quality_filter=not args.no_quality,
        repetition_filter=not args.no_repetition,
        languages=args.languages.split(",") if args.languages else None,
        exact_dedup=not args.no_exact_dedup,
        line_dedup=not args.no_line_dedup,
        near_dedup=not args.no_near_dedup,
        redact=not args.no_redact,
    )
    write_table(curated, args.out)  # Iceberg table name or parquet path
    print("CURATE_DONE " + json.dumps(metrics))


if __name__ == "__main__":
    main()
