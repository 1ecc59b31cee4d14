"""Structured Streaming front-end for the miner engine.

The reference consumes streams pull-based in batches
(``extractor->next(batch)``, ``/root/reference/src/extractor.c:205-261``);
the Spark-native equivalent for continuously arriving pages is
``readStream`` → the same ``mapInPandas`` mining kernel (it is
streaming-compatible: stateless per document) → ``writeStream``. Late/replayed
data is handled by idempotent MERGE in ``foreachBatch`` keyed on the natural
occurrence key, so reprocessing a micro-batch cannot duplicate rows — the
streaming analogue of the reference's resumable ``next()`` loop.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from nativeextractor_spark.miners.base import Miner
from nativeextractor_spark.operators.extract import extract_occurrences


def mine_stream(pages_stream: DataFrame, miners: Sequence[Miner]) -> DataFrame:
    """Streaming pages (url, text, ...) → streaming occurrences DataFrame."""
    if not pages_stream.isStreaming:
        raise ValueError("mine_stream expects a streaming DataFrame (readStream)")
    return extract_occurrences(pages_stream, miners)


def write_stream_merge(
    occurrences_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
):
    """writeStream with per-micro-batch idempotent MERGE.

    Keys on (url, pos, len, label) — replays of a micro-batch overwrite the
    same rows instead of appending duplicates.
    """
    from nativeextractor_spark.kg.graph import merge_into

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into(batch_df, out_path, keys=["url", "pos", "len", "label"])

    return (
        occurrences_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
