"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG slice (documents → mention scan →
sentence-window triples → weighted triple aggregation) at sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data ops; the registry lives in
``nativeextractor_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → miners → sentence-window triples → weights."""
    from nativeextractor_spark.kg.triples import extract_triples, weight_triples
    from nativeextractor_spark.miners import (
        AliasDict,
        EmailMiner,
        GazetteerMiner,
        UrlMiner,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    gaz = GazetteerMiner(
        AliasDict.from_aliases(
            ["spark", "window", "stream", "batch", "hash", "join", "scan",
             "sort", "merge", "table"]
        ),
        label="NER",
    )
    pages = docs.select(F.col("doc_id").alias("url"), "text")
    triples = extract_triples(pages, [gaz, EmailMiner(), UrlMiner()])
    return weight_triples(triples)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nativeextractor_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from nativeextractor_spark.queries import build_oracles

    return build_oracles()
