"""spark-submit entry point for the KG construction pipeline.

Usage (cluster):
    zip -r nativeextractor_spark.zip nativeextractor_spark
    spark-submit --py-files nativeextractor_spark.zip jobs/run_pipeline.py \
        --pages <pages table/path> --out <output root> \
        [--aliases <alias csv>] [--checkpoint <ckpt root>] [--n-pages N]

Local smoke:
    python jobs/run_pipeline.py --synthetic 1000 --out /tmp/kg_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet/Iceberg)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of reading --pages")
    ap.add_argument("--aliases", help="alias dictionary CSV (alias,entity_id,...)")
    ap.add_argument("--out", required=True, help="output root for nodes/edges")
    ap.add_argument("--checkpoint", help="checkpoint root for exact resume")
    args = ap.parse_args()

    from nativeextractor_spark.session import get_spark
    from nativeextractor_spark.datagen import build_alias_df, generate_pages_df
    from nativeextractor_spark.io import read_table
    from nativeextractor_spark.kg import run_pipeline
    from nativeextractor_spark.kg.pipeline import materialize_graph

    spark = get_spark("kg-pipeline")
    if args.synthetic:
        pages = generate_pages_df(spark, n_pages=args.synthetic)
        input_sig = f"synthetic:{args.synthetic}"
    elif args.pages:
        pages = read_table(spark, args.pages)
        input_sig = args.pages
    else:
        ap.error("either --pages or --synthetic is required")

    alias_df = None
    if args.aliases:
        alias_df = (
            spark.read.option("header", "true").csv(args.aliases)
            .selectExpr(
                "alias",
                "cast(entity_id as long) entity_id",
                "coalesce(canonical, alias) canonical",
                "coalesce(entity_type, 'ENT') entity_type",
            )
        )

    out = run_pipeline(
        spark,
        pages,
        alias_df=alias_df,
        checkpoint_root=args.checkpoint,
        input_sig=input_sig,
    )
    materialize_graph(out["nodes"], out["edges"], args.out)
    stats = {
        name: out[name].count()
        for name in ("occurrences", "triples", "nodes", "edges")
    }
    print("PIPELINE_DONE", stats)
    spark.stop()


if __name__ == "__main__":
    main()
