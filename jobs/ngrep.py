"""ngrep: glob-grep over documents — the reference's flagship example tool.

Equivalent of ``/root/reference/src/example/ngrep.c``: scan input with a glob
(or regex/email/url) miner and print occurrences in plain, JSON, or CSV form.

Usage:
    python jobs/ngrep.py GLOB PATH [--format plain|json|csv]
        [--kind glob|regex|email|url] [--no-enclosed]

PATH may be a parquet table with (url|doc_id, text) columns or a plain text
file (read as one document, like the reference's mmap'd stream).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(prog="ngrep")
    ap.add_argument("pattern", help="glob (or regex with --kind regex)")
    ap.add_argument("path", help="parquet table or plain text file")
    ap.add_argument("--format", default="plain", choices=["plain", "json", "csv"])
    ap.add_argument("--kind", default="glob", choices=["glob", "regex", "email", "url"])
    ap.add_argument("--no-enclosed", action="store_true",
                    help="drop enclosed occurrences (E_NO_ENCLOSED_OCCURRENCES)")
    args = ap.parse_args()

    from nativeextractor_spark.miners import (
        EmailMiner,
        GlobMiner,
        RegexMiner,
        UrlMiner,
    )
    from nativeextractor_spark.operators import (
        extract_occurrences,
        format_occurrences,
    )
    from nativeextractor_spark.session import get_spark

    if args.kind == "glob":
        miner = GlobMiner(args.pattern)
    elif args.kind == "regex":
        miner = RegexMiner("Regex", args.pattern)
    elif args.kind == "email":
        miner = EmailMiner()
    else:
        miner = UrlMiner()

    spark = get_spark("ngrep")
    if os.path.isdir(args.path) or args.path.endswith(".parquet"):
        df = spark.read.parquet(args.path)
        key = "url" if "url" in df.columns else df.columns[0]
        pages = df.selectExpr(f"cast({key} as string) as url", "text")
    else:
        with open(args.path, encoding="utf-8") as f:
            pages = spark.createDataFrame(
                [(args.path, f.read())], "url string, text string"
            )

    occ = extract_occurrences(pages, [miner], no_enclosed=args.no_enclosed)
    for row in format_occurrences(occ, args.format).collect():
        print(row.line)
    spark.stop()


if __name__ == "__main__":
    main()
