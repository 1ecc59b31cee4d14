"""Streaming corpus curation: cross-micro-batch exact deduplication.

The batch operators in :mod:`nativeextractor_spark.textops` are stateless
per document (quality scores, language id, fingerprints, redaction) and
run on a streaming DataFrame unchanged. Exact dedup is the one curation
stage that needs STATE — a document seen in micro-batch 1 must suppress
its duplicate arriving in micro-batch 400. Spark's streaming
deduplication operator carries that state in the checkpoint, so the
guarantee survives restarts (the streaming analogue of the batch
``dedup_exact`` keep-first rule).

State sizing at scale: one row per distinct digest, forever, unless a
watermark bounds it — pass ``watermark=("ts_col", "N hours")`` to use
``dropDuplicatesWithinWatermark`` (duplicates are only suppressed within
the watermark window; state is purged past it). Unbounded mode is exact
but its state grows with the distinct corpus — at 10^12 documents use
the watermark, or periodic batch re-dedup downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    pages_stream: DataFrame,
    text_col: str = "text",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Streaming pages → streaming pages with exact-duplicate texts
    suppressed across micro-batches (first arrival wins; state in the
    checkpoint). ``watermark=(event_time_col, delay)`` bounds the state
    to the watermark window."""
    if not pages_stream.isStreaming:
        raise ValueError(
            "dedup_stream_exact expects a streaming DataFrame (readStream)"
        )
    hashed = pages_stream.withColumn(
        "_text_sha", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    )
    if watermark is not None:
        col, delay = watermark
        out = hashed.withWatermark(col, delay).dropDuplicatesWithinWatermark(
            ["_text_sha"]
        )
    else:
        out = hashed.dropDuplicates(["_text_sha"])
    return out.drop("_text_sha")
