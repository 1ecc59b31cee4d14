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

from nativeextractor_spark.staging import stage


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


def dedup_stream_near(
    pages_stream: DataFrame,
    out_path: str,
    state_path: str,
    checkpoint_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    num_hashes: int = 8,
    k: int = 3,
    min_shared_bands: int = 2,
):
    """Streaming NEAR-duplicate suppression across micro-batches (r4).

    A document arriving in micro-batch N is suppressed when its MinHash
    band signature shares >= ``min_shared_bands`` bands with one canonical
    document — either a survivor of an earlier batch (cross-batch, via the
    durable band-state table at ``state_path``) or a smaller-id member of
    its own batch (within-batch, MinHash-LSH pairs + connected components
    keep-min, the same rule as the batch ``curate_corpus`` stage).

    Restart safety: the sink is a ``foreachBatch`` whose two writes are
    both idempotent ``merge_into`` upserts (survivors keyed on the doc id,
    band state keyed on (doc_id, band)); the band state carries the
    writing ``batch_id`` and each batch only matches against state rows
    with ``batch_id < N`` — a replay of batch N can never match the
    partial state it wrote before failing.

    State sizing at scale: ``num_hashes`` rows per SURVIVOR, forever —
    suppressed documents contribute nothing, and matching is always
    against canonical representatives only (near-duplication is not
    chained transitively across suppressed docs, the standard streaming
    trade). Compact or TTL the state table out of band for unbounded
    corpora. Returns a DataStreamWriter (availableNow trigger) — call
    ``.start()``.
    """
    if not pages_stream.isStreaming:
        raise ValueError(
            "dedup_stream_near expects a streaming DataFrame (readStream)"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from nativeextractor_spark.kg.components import connected_components
        from nativeextractor_spark.kg.graph import merge_into
        from nativeextractor_spark.textops.dedup import (
            lsh_duplicate_pairs,
            minhash_bands,
        )

        spark = batch_df.sparkSession
        docs = (
            batch_df.select(
                F.col(id_col).cast("string").alias("_id"),
                F.col(text_col).alias("_text"),
            )
            .groupBy("_id")
            .agg(F.min("_text").alias("_text"))
            .transform(stage("sdedup"))
        )
        if docs.isEmpty():
            return
        bands = minhash_bands(
            docs,
            text_col="_text",
            id_col="_id",
            num_hashes=num_hashes,
            k=k,
            hash_flavor="xx64",
            shingle="word_hash",
        ).transform(stage("sdedup"))

        drops = None
        # cross-batch: match against canonical survivors of EARLIER
        # batches. ONLY a missing state table (the very first batch) maps
        # to prior=None — any other read error must propagate and fail the
        # batch (r4 review: a swallowed transient error would silently run
        # with cross-batch matching OFF, admitting near-duplicates into
        # the canonical set forever)
        from pyspark.errors import AnalysisException

        try:
            prior = spark.read.parquet(state_path).where(
                F.col("batch_id") < F.lit(batch_id)
            )
        except AnalysisException as e:
            msg = str(e)
            # recoverable no-prior-state shapes: the path does not exist
            # (first batch ever) or it exists with no readable data files
            # (batch 0 crashed mid-write, leaving only _temporary — the
            # reader then raises UNABLE_TO_INFER_SCHEMA; r4 review 2:
            # re-raising that would wedge the stream forever, since the
            # read always precedes the state write)
            recoverable = (
                "PATH_NOT_FOUND" in msg
                or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg
            )
            if not recoverable:
                raise
            prior = None
        if prior is not None:
            drops = (
                bands.join(
                    prior.select(
                        F.col("doc_id").alias("_pid"), "band", "min_hash"
                    ),
                    ["band", "min_hash"],
                )
                .groupBy("doc_id", "_pid")
                .agg(F.countDistinct("band").alias("_nb"))
                .where(F.col("_nb") >= min_shared_bands)
                .select(F.col("doc_id").alias("_id"))
                .distinct()
            )
        # within-batch: LSH pairs -> connected components -> keep min id
        pairs = lsh_duplicate_pairs(
            docs,
            text_col="_text",
            id_col="_id",
            num_hashes=num_hashes,
            k=k,
            min_shared_bands=min_shared_bands,
            hash_flavor="xx64",
            shingle="word_hash",
        )
        edges = pairs.select(
            F.xxhash64("doc_a").alias("u"), F.xxhash64("doc_b").alias("v")
        ).transform(stage("sdedup"))
        if not edges.isEmpty():
            comps = connected_components(edges)
            hashed = docs.select("_id", F.xxhash64("_id").alias("_h"))
            clustered = hashed.join(comps, hashed["_h"] == comps["node"]).select(
                "_id", "component"
            )
            keep_ids = clustered.groupBy("component").agg(
                F.min("_id").alias("_id")
            ).select("_id")
            batch_drop = clustered.select("_id").join(
                keep_ids, "_id", "left_anti"
            )
            drops = (
                batch_drop
                if drops is None
                else drops.unionByName(batch_drop).distinct()
            )
        survivors = (
            docs if drops is None else docs.join(drops, "_id", "left_anti")
        ).transform(stage("sdedup"))
        merge_into(
            survivors.select(
                F.col("_id").alias(id_col), F.col("_text").alias(text_col)
            ),
            out_path,
            keys=[id_col],
        )
        surviving_bands = bands.join(
            survivors.select(F.col("_id").alias("doc_id")), "doc_id"
        ).withColumn("batch_id", F.lit(batch_id))
        merge_into(surviving_bands, state_path, keys=["doc_id", "band"])

    return (
        pages_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
