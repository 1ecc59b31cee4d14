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
    key = "_ne_dedup_sha"
    if key in pages_stream.columns:
        raise ValueError(f"input stream already has a {key!r} column")
    # NULL text hashes to NULL (not coalesced to ''): dropDuplicates groups
    # NULL keys together, so NULL-text docs dedup among THEMSELVES and
    # never against empty-string docs — the same grouping the batch
    # dedup_exact's groupBy(sha2(text)) produces
    hashed = pages_stream.withColumn(key, F.sha2(F.col(text_col), 256))
    if watermark is not None:
        col, delay = watermark
        out = hashed.withWatermark(col, delay).dropDuplicatesWithinWatermark(
            [key]
        )
    else:
        out = hashed.dropDuplicates([key])
    return out.drop(key)
