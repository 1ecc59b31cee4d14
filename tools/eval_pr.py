"""Triple precision/recall harness: distributed run vs reference-semantics run.

The reference engine emits occurrences, not triples; the triple contract is
the deterministic per-document specification in ``kg/triples.py``. This
harness executes that specification twice —

- **golden**: single-process, document-at-a-time (pure Python, no Spark
  partitioning/Arrow in the loop), and
- **system**: the distributed `extract_triples` job —

and scores exact-match P/R on (url, subj, pred, obj). Any loss of parity in
the distributed path (partitioning, Arrow batching, kernel batching, pickle
round-trips) shows up here. Target per BASELINE.json: P and R ≥ 0.95
(the deterministic pipeline achieves 1.0).

Usage: python tools/eval_pr.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from nativeextractor_spark.datagen import generate_pages_df
    from nativeextractor_spark.datagen.pages import FIXTURE_TEXTS, page_rows
    from nativeextractor_spark.kg.pipeline import default_kg_miners
    from nativeextractor_spark.kg.triples import document_triples, extract_triples
    from nativeextractor_spark.session import get_spark

    miners = default_kg_miners()

    # golden: single-process, per-document
    golden: set[tuple] = set()
    rows = page_rows(range(n_pages))
    all_docs = [(r[0], r[3]) for r in rows] + list(FIXTURE_TEXTS.items())
    for url, text in all_docs:
        if not text:
            continue
        for subj, _, pred, obj, _, u, _, _, _ in document_triples(url, text, miners):
            golden.add((u, subj, pred, obj))

    # system: distributed
    spark = get_spark("eval-pr")
    pages = generate_pages_df(spark, n_pages=n_pages)
    t = extract_triples(pages, miners)
    system = {
        (r.url, r.subj, r.pred, r.obj)
        for r in t.select("url", "subj", "pred", "obj").collect()
    }
    spark.stop()

    tp = len(golden & system)
    precision = tp / len(system) if system else 1.0
    recall = tp / len(golden) if golden else 1.0
    result = {
        "n_pages": n_pages,
        "golden_triples": len(golden),
        "system_triples": len(system),
        "true_positives": tp,
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "target": 0.95,
        "pass": precision >= 0.95 and recall >= 0.95,
    }
    print(json.dumps(result))
    if not result["pass"]:
        examples = list((golden - system))[:3] + list((system - golden))[:3]
        print("mismatch examples:", examples, file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
