"""Streaming miner front-end + ngrep-format sinks."""

import json

import pytest

from nativeextractor_spark.miners import EmailMiner, GlobMiner
from nativeextractor_spark.operators.extract import extract_occurrences
from nativeextractor_spark.operators.sinks import format_occurrences
from nativeextractor_spark.streaming import mine_stream, write_stream_merge


@pytest.fixture(scope="module")
def occ(spark):
    pages = spark.createDataFrame(
        [("u1", "mail a@b.com here"), ("u2", "abc")], "url string, text string"
    )
    return extract_occurrences(pages, [EmailMiner(), GlobMiner("abc")]).cache()


def test_format_json(spark, occ):
    rows = format_occurrences(occ, "json").collect()
    parsed = [json.loads(r.line) for r in rows]
    assert any(p["label"] == "EMAIL" and p["str"] == "a@b.com" for p in parsed)


def test_format_plain_and_csv(spark, occ):
    plain = [r.line for r in format_occurrences(occ, "plain").collect()]
    assert any('"a@b.com" @ pos=5 len=7 [EMAIL]' == l for l in plain)
    csv = [r.line for r in format_occurrences(occ, "csv").collect()]
    assert any(l.startswith("u2,0,0,3,3,Glob") for l in csv)
    with pytest.raises(ValueError):
        format_occurrences(occ, "xml")


def test_streaming_mine_and_merge(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    out = str(tmp_path_factory.mktemp("stream_out")) + "/occ"
    ck = str(tmp_path_factory.mktemp("stream_ck"))

    pages = spark.createDataFrame(
        [("s1", "ping a@b.com"), ("s2", "abc abc")], "url string, text string"
    )
    pages.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("url string, text string").parquet(src)
    occ_stream = mine_stream(stream, [EmailMiner(), GlobMiner("abc")])
    assert occ_stream.isStreaming
    q = write_stream_merge(occ_stream, out, ck).start()
    q.awaitTermination(120)

    rows = {(r.url, r.label, r.str) for r in spark.read.parquet(out).collect()}
    n_before = spark.read.parquet(out).count()
    assert ("s1", "EMAIL", "a@b.com") in rows
    assert ("s2", "Glob", "abc") in rows

    # replaying the same data through a fresh stream must not duplicate
    q2 = write_stream_merge(
        mine_stream(
            spark.readStream.schema("url string, text string").parquet(src),
            [EmailMiner(), GlobMiner("abc")],
        ),
        out,
        str(tmp_path_factory.mktemp("stream_ck2")),
    ).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before


def test_mine_stream_rejects_batch_df(spark):
    pages = spark.createDataFrame([("u", "x")], "url string, text string")
    with pytest.raises(ValueError):
        mine_stream(pages, [EmailMiner()])


def test_streaming_restart_resume(spark, tmp_path_factory):
    """Checkpointed restart: a second availableNow run with the SAME
    checkpoint processes only files added since the first run (per-partition
    lineage lives in the checkpoint), and the merge sink keeps the output
    exactly-once either way."""
    import os

    src = str(tmp_path_factory.mktemp("resume_src"))
    out = str(tmp_path_factory.mktemp("resume_out")) + "/occ"
    ck = str(tmp_path_factory.mktemp("resume_ck"))
    miners = [EmailMiner()]

    def run_once():
        q = write_stream_merge(
            mine_stream(
                spark.readStream.schema("url string, text string").parquet(src),
                miners,
            ),
            out,
            ck,
        ).start()
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", "x p@q.rs y")], "url string, text string"
    ).write.mode("append").parquet(src)
    run_once()
    assert {r.url for r in spark.read.parquet(out).collect()} == {"a"}

    # restart with no new input: nothing reprocessed, output unchanged
    run_once()
    assert spark.read.parquet(out).count() == 1

    # add a file, restart with the SAME checkpoint: only the new doc lands
    spark.createDataFrame(
        [("b", "z new@mail.io w")], "url string, text string"
    ).write.mode("append").parquet(src)
    run_once()
    rows = {(r.url, r.str) for r in spark.read.parquet(out).collect()}
    assert rows == {("a", "p@q.rs"), ("b", "new@mail.io")}


def test_streaming_exact_dedup_state_survives_restart(spark, tmp_path_factory):
    """dedup_stream_exact suppresses duplicate texts ACROSS micro-batches
    and across stream restarts (state lives in the checkpoint): batch 2
    replays a batch-1 text plus a new one — only the new doc lands."""
    from nativeextractor_spark.streaming import dedup_stream_exact

    src = str(tmp_path_factory.mktemp("dd_src"))
    out = str(tmp_path_factory.mktemp("dd_out")) + "/docs"
    ck = str(tmp_path_factory.mktemp("dd_ck"))

    def run_once():
        stream = spark.readStream.schema("url string, text string").parquet(src)
        deduped = dedup_stream_exact(stream)

        def sink(batch_df, batch_id):
            if not batch_df.isEmpty():
                batch_df.write.mode("append").parquet(out)

        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [("u1", "same text"), ("u2", "same text"), ("u3", "other text")],
        "url string, text string",
    ).write.mode("append").parquet(src)
    run_once()
    first = {r.text for r in spark.read.parquet(out).collect()}
    assert first == {"same text", "other text"}
    assert spark.read.parquet(out).count() == 2

    spark.createDataFrame(
        [("u4", "same text"), ("u5", "brand new")],
        "url string, text string",
    ).write.mode("append").parquet(src)
    run_once()
    rows = spark.read.parquet(out).collect()
    assert {r.text for r in rows} == {"same text", "other text", "brand new"}
    assert len(rows) == 3  # the replayed duplicate was suppressed by state


def test_stateless_curation_ops_run_on_streams(spark, tmp_path_factory):
    """The per-document curation operators are streaming-compatible as-is
    (stateless projections): quality + redaction over a readStream."""
    from nativeextractor_spark.textops.quality import quality_scores
    from nativeextractor_spark.textops.redact import redact_pii

    src = str(tmp_path_factory.mktemp("cur_src")) + "/data"
    spark.createDataFrame(
        [("u1", "mail a@b.com now please do"), ("u2", "plain words only here")],
        "url string, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("url string, text string").parquet(src)
    red = redact_pii(stream)
    assert red.isStreaming
    q = (
        red.writeStream.format("memory")
        .queryName("cur_red")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.url: r.text for r in spark.sql("select * from cur_red").collect()}
    assert got["u1"] == "mail <EMAIL> now please do"

    qs = quality_scores(stream.withColumnRenamed("url", "doc_id"))
    assert qs.isStreaming


def test_streaming_dedup_null_vs_empty_text(spark, tmp_path_factory):
    """Review r3: NULL-text and empty-text docs must NOT suppress each
    other (batch dedup_exact groups them separately)."""
    from nativeextractor_spark.streaming import dedup_stream_exact

    src = str(tmp_path_factory.mktemp("nn_src")) + "/data"
    spark.createDataFrame(
        [("u1", ""), ("u2", None), ("u3", "")],
        "url string, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("url string, text string").parquet(src)
    q = (
        dedup_stream_exact(stream)
        .writeStream.format("memory")
        .queryName("nn_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from nn_out").collect()
    texts = sorted((r.text if r.text is not None else "<NULL>") for r in rows)
    # one empty-string survivor AND one NULL survivor
    assert texts == ["", "<NULL>"]


def test_streaming_near_dedup_cross_batch(spark, tmp_path_factory):
    """r4 dedup_stream_near: a near-duplicate arriving in a LATER
    micro-batch is suppressed by the durable band state; distinct docs and
    within-batch near-dup clusters follow the keep-min rule; restart with
    the same checkpoint reprocesses nothing."""
    from nativeextractor_spark.streaming.dedup import dedup_stream_near

    src = str(tmp_path_factory.mktemp("near_src"))
    out = str(tmp_path_factory.mktemp("near_out")) + "/docs"
    state = str(tmp_path_factory.mktemp("near_state")) + "/bands"
    ck = str(tmp_path_factory.mktemp("near_ck"))

    base = "the quick brown fox jumps over the lazy dog again and again today"

    def run_once():
        stream = spark.readStream.schema("url string, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = dedup_stream_near(stream, out, state, ck).start()
        q.awaitTermination(180)

    # batch 1: A, its in-batch near-dup A2 (larger id -> dropped), B distinct
    spark.createDataFrame(
        [
            ("docA", base),
            ("docA2", base + " extra"),
            ("docB", "completely different words about spark shuffles and joins here"),
        ],
        "url string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert {r.url for r in spark.read.parquet(out).collect()} == {"docA", "docB"}

    # batch 2 (new file, same checkpoint): near-dup of A suppressed
    # cross-batch; C distinct survives
    spark.createDataFrame(
        [
            ("docA3", base + " slightly"),
            ("docC", "yet another unrelated page mentioning parquet files and arrow batches"),
        ],
        "url string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    urls = {r.url for r in spark.read.parquet(out).collect()}
    assert urls == {"docA", "docB", "docC"}, urls

    # restart with no new input: output unchanged (checkpoint lineage)
    run_once()
    assert spark.read.parquet(out).count() == 3
    # state holds bands for survivors only
    st = spark.read.parquet(state)
    assert set(r.doc_id for r in st.select("doc_id").distinct().collect()) == {
        "docA", "docB", "docC"
    }


def test_near_dedup_band_generations_compaction_and_ttl(
    spark, tmp_path_factory
):
    """r5: (a) a survivor re-arriving with CHANGED text appends a new band
    generation without overwriting the prior one (replay-safe state keyed
    on (doc_id, band, batch_id) — ADVICE r4 medium); (b) compact_band_state
    collapses a doc to its latest generation and post-compaction matching
    follows the doc's CURRENT canonical text; (c) the TTL flavor drops
    stale docs, re-admitting their future near-duplicates."""
    from nativeextractor_spark.streaming.dedup import (
        compact_band_state,
        dedup_stream_near,
    )

    src = str(tmp_path_factory.mktemp("gen_src"))
    out = str(tmp_path_factory.mktemp("gen_out")) + "/docs"
    state = str(tmp_path_factory.mktemp("gen_state")) + "/bands"
    ck = str(tmp_path_factory.mktemp("gen_ck"))

    tA1 = "the quick brown fox jumps over the lazy dog again and again today"
    tA2 = (
        "volcanic eruptions reshape island coastlines through repeated "
        "lava flows each season"
    )
    tB = "completely different words about spark shuffles and joins here"

    def feed(rows):
        spark.createDataFrame(rows, "url string, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("url string, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = dedup_stream_near(stream, out, state, ck).start()
        q.awaitTermination(180)

    # batch 0: two distinct docs
    feed([("docA", tA1), ("docB", tB)])
    run_once()
    # batch 1: docA re-arrives with entirely new text -> survives again
    feed([("docA", tA2)])
    run_once()
    st = spark.read.parquet(state)
    gens = {
        (r.doc_id, r.batch_id)
        for r in st.select("doc_id", "batch_id").distinct().collect()
    }
    # (a) BOTH docA generations present: the batch-0 rows were not
    # overwritten by the batch-1 upsert
    assert ("docA", 0) in gens and ("docA", 1) in gens, gens
    assert ("docB", 0) in gens
    a_rows = st.where(st.doc_id == "docA").count()
    assert a_rows == 16, a_rows  # 8 hashes x 2 generations

    # (b) compact: docA collapses to the batch-1 generation only
    res = compact_band_state(spark, state)
    assert res == {"rows_before": 24, "rows_after": 16, "docs_dropped": 0}, res
    st = spark.read.parquet(state)
    assert st.where(st.doc_id == "docA").count() == 8
    assert (
        st.where(st.doc_id == "docA").select("batch_id").distinct().collect()[0]
        .batch_id
        == 1
    )

    # batch 2: near-dup of docA's OLD text now survives (old generation
    # compacted away; canonical docA text IS tA2), near-dup of the NEW
    # text is still suppressed
    feed([("docA_old_dup", tA1 + " extra"), ("docA_new_dup", tA2 + " extra")])
    run_once()
    urls = {r.url for r in spark.read.parquet(out).collect()}
    assert urls == {"docA", "docB", "docA_old_dup"}, urls

    # (c) TTL: docB's latest generation is batch 0 < 1 -> dropped whole
    res = compact_band_state(spark, state, drop_before_batch=1)
    assert res["docs_dropped"] == 1, res
    st = spark.read.parquet(state)
    assert "docB" not in {r.doc_id for r in st.select("doc_id").collect()}
    # batch 3: a near-dup of docB is re-admitted
    feed([("docB_dup", tB + " extra")])
    run_once()
    urls = {r.url for r in spark.read.parquet(out).collect()}
    assert urls == {"docA", "docB", "docA_old_dup", "docB_dup"}, urls


def test_band_state_v1_layout_migration(spark, tmp_path_factory):
    """ADVICE r5 (medium): a state table written under the r4 (doc_id,
    band) key layout is detected and fully re-written under the current
    layout BEFORE the first merge — its rows keep matching (batch_id=-1
    stamps always pass the batch_id < N filter) instead of being silently
    deleted by touched-bucket rewrites under the new key hash."""
    from pyspark.sql import functions as F

    from nativeextractor_spark.kg.graph import merge_into
    from nativeextractor_spark.streaming.dedup import (
        _read_layout,
        BAND_STATE_LAYOUT,
        dedup_stream_near,
    )
    from nativeextractor_spark.textops.dedup import minhash_bands

    src = str(tmp_path_factory.mktemp("mig_src"))
    out = str(tmp_path_factory.mktemp("mig_out")) + "/docs"
    state = str(tmp_path_factory.mktemp("mig_state")) + "/bands"
    ck = str(tmp_path_factory.mktemp("mig_ck"))

    base = "the quick brown fox jumps over the lazy dog again and again today"
    # the r4-era state: docA's bands keyed (doc_id, band), NO batch_id
    # column, bucketed under the old key hash
    old_docs = spark.createDataFrame([("docA", base)], "_id string, _text string")
    v1 = minhash_bands(
        old_docs, text_col="_text", id_col="_id",
        num_hashes=8, k=3, hash_flavor="xx64", shingle="word_hash",
    )
    merge_into(v1, state, keys=["doc_id", "band"])
    assert _read_layout(spark, state) is None  # genuinely un-stamped

    # first post-upgrade batch: a near-dup of the r4-era survivor plus a
    # distinct doc
    spark.createDataFrame(
        [
            ("docA_dup", base + " extra"),
            ("docNew", "completely different words about spark shuffles and joins here"),
        ],
        "url string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("url string, text string").parquet(src)
    q = dedup_stream_near(stream, out, state, ck).start()
    q.awaitTermination(180)

    # the old state was migrated, not lost: docA_dup is suppressed
    urls = {r.url for r in spark.read.parquet(out).collect()}
    assert urls == {"docNew"}, urls
    assert _read_layout(spark, state) == BAND_STATE_LAYOUT
    st = spark.read.parquet(state)
    by_doc = {
        r.doc_id: r.batch_id
        for r in st.select("doc_id", "batch_id").distinct().collect()
    }
    assert by_doc == {"docA": -1, "docNew": 0}, by_doc


def test_band_state_pruned_read_is_bounded(spark, tmp_path_factory):
    """r6: the per-batch state read scans only the _bucket= partitions
    the batch's (band, min_hash) values hash to — a bounded fraction of
    a grown state table — and returns exactly the rows a full scan would
    join on those keys."""
    from pyspark.sql import functions as F

    from nativeextractor_spark.kg.graph import merge_into
    from nativeextractor_spark.streaming.dedup import (
        BAND_STATE_LAYOUT,
        _read_band_state,
        _stamp_layout,
    )

    state = str(tmp_path_factory.mktemp("prune_state")) + "/bands"
    # a grown corpus-lifetime state: 500 docs x 8 bands, arbitrary hashes
    grown = spark.range(500 * 8).select(
        F.concat(F.lit("doc"), (F.col("id") / 8).cast("long")).alias("doc_id"),
        (F.col("id") % 8).cast("int").alias("band"),
        F.xxhash64("id").alias("min_hash"),
        F.lit(0).cast("long").alias("batch_id"),
    )
    merge_into(
        grown, state,
        keys=BAND_STATE_LAYOUT["keys"],
        bucket_cols=BAND_STATE_LAYOUT["bucket_cols"],
    )
    _stamp_layout(spark, state)

    # one small batch: a single doc's 8 bands, half of them colliding
    # with known state rows
    probe = grown.where(F.col("doc_id") == "doc7").select(
        F.lit("probe").alias("doc_id"), "band", "min_hash",
    ).where(F.col("band") < 4).unionByName(
        spark.range(4).select(
            F.lit("probe").alias("doc_id"),
            (F.col("id") + 4).cast("int").alias("band"),
            F.xxhash64(F.col("id") + 10_000_000).alias("min_hash"),
        )
    ).localCheckpoint(eager=True)

    pruned = _read_band_state(spark, state, prune_bands=probe)
    full = _read_band_state(spark, state)
    # bounded read: at most 8 of the populated partitions
    n_pruned, n_full = len(pruned.inputFiles()), len(full.inputFiles())
    assert n_pruned <= 8 < n_full, (n_pruned, n_full)
    # same matches as the full scan
    key = ["band", "min_hash"]
    m_pruned = sorted(
        (r.doc_id, r.band) for r in pruned.join(probe.select(*key), key).collect()
    )
    m_full = sorted(
        (r.doc_id, r.band) for r in full.join(probe.select(*key), key).collect()
    )
    assert m_pruned == m_full and len(m_pruned) == 4, (m_pruned, m_full)


def test_band_state_interrupted_swap_raises(spark, tmp_path_factory):
    """ADVICE r5 (low): an interrupted compaction swap must NOT read as
    never-written (which would silently restart dedup from empty state)
    — a missing live table with a .compact/.old leftover raises."""
    import pytest
    from pyspark.sql import functions as F

    from nativeextractor_spark.kg.graph import _hadoop_fs, merge_into
    from nativeextractor_spark.streaming.dedup import (
        BAND_STATE_LAYOUT,
        _read_band_state,
    )

    state = str(tmp_path_factory.mktemp("swap_state")) + "/bands"
    rows = spark.range(8).select(
        F.lit("docA").alias("doc_id"),
        F.col("id").cast("int").alias("band"),
        F.xxhash64("id").alias("min_hash"),
        F.lit(0).cast("long").alias("batch_id"),
    )
    merge_into(
        rows, state,
        keys=BAND_STATE_LAYOUT["keys"],
        bucket_cols=BAND_STATE_LAYOUT["bucket_cols"],
    )
    # simulate a crash between rename-aside and rename-in: live table
    # gone, compacted candidate left behind
    fs, jstate = _hadoop_fs(spark, state)
    _, jcompact = _hadoop_fs(spark, state + ".compact")
    assert fs.rename(jstate, jcompact)
    with pytest.raises(RuntimeError, match="interrupted swap"):
        _read_band_state(spark, state)
    # recovery (rename back) restores normal reads
    assert fs.rename(jcompact, jstate)
    assert _read_band_state(spark, state).count() == 8


def test_band_state_listing_bounded_by_touched_buckets(
    spark, tmp_path_factory, monkeypatch
):
    """r7 (TODO #5): per-batch FILE LISTING, not just reading, is bounded
    by the batch's bucket spread — each touched bucket is existence-probed
    directly; the corpus-lifetime state directory is never enumerated."""
    from pyspark.sql import functions as F

    import nativeextractor_spark.kg.graph as graph
    from nativeextractor_spark.kg.graph import merge_into
    from nativeextractor_spark.streaming.dedup import (
        BAND_STATE_LAYOUT,
        _read_band_state,
        _stamp_layout,
    )

    state = str(tmp_path_factory.mktemp("listing_state")) + "/bands"
    grown = spark.range(2000).select(
        F.concat(F.lit("d"), (F.col("id") / 8).cast("long")).alias("doc_id"),
        (F.col("id") % 8).cast("int").alias("band"),
        F.xxhash64("id").alias("min_hash"),
        F.lit(0).cast("long").alias("batch_id"),
    )
    merge_into(
        grown, state,
        keys=BAND_STATE_LAYOUT["keys"],
        bucket_cols=BAND_STATE_LAYOUT["bucket_cols"],
    )
    _stamp_layout(spark, state)

    probe = grown.where(F.col("doc_id") == "d3").select(
        "doc_id", "band", "min_hash"
    ).localCheckpoint(eager=True)
    n_touched = probe.select(
        F.pmod(F.xxhash64("band", "min_hash"), F.lit(graph.N_BUCKETS))
    ).distinct().count()

    probed_buckets = []
    real_exists = graph._fs_exists

    def spy_exists(sp, path):
        if "_bucket=" in path:
            probed_buckets.append(path)
        return real_exists(sp, path)

    monkeypatch.setattr(graph, "_fs_exists", spy_exists)
    pruned = _read_band_state(spark, state, prune_bands=probe)
    assert len(probed_buckets) == n_touched <= 8
    # and the pruned frame still matches what a full scan joins
    key = ["band", "min_hash"]
    assert pruned.join(probe.select(*key), key).count() == 8


def test_migrate_absent_live_with_swap_leftover_raises(
    spark, tmp_path_factory
):
    """ADVICE r6 (low): migrate_band_state called directly while the live
    table is ABSENT next to an interrupted-swap leftover must raise, not
    stamp an empty table over the recoverable state."""
    import pytest
    from pyspark.sql import functions as F

    from nativeextractor_spark.kg.graph import _hadoop_fs, merge_into
    from nativeextractor_spark.streaming.dedup import (
        BAND_STATE_LAYOUT,
        _read_band_state,
        migrate_band_state,
    )

    state = str(tmp_path_factory.mktemp("mig_state")) + "/bands"
    rows = spark.range(8).select(
        F.lit("docA").alias("doc_id"),
        F.col("id").cast("int").alias("band"),
        F.xxhash64("id").alias("min_hash"),
        F.lit(0).cast("long").alias("batch_id"),
    )
    merge_into(
        rows, state,
        keys=BAND_STATE_LAYOUT["keys"],
        bucket_cols=BAND_STATE_LAYOUT["bucket_cols"],
    )
    fs, jstate = _hadoop_fs(spark, state)
    _, jold = _hadoop_fs(spark, state + ".old")
    assert fs.rename(jstate, jold)
    with pytest.raises(RuntimeError, match="interrupted swap"):
        migrate_band_state(spark, state)
    # recovery restores both migration and reads
    assert fs.rename(jold, jstate)
    assert migrate_band_state(spark, state)["rows"] == 8
    assert _read_band_state(spark, state).count() == 8
