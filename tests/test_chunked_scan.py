"""Oversized-document chunked scan (operators/chunked.py, r7): chunked
== whole-document on the reference fixture texts at chunk sizes down to
1 char, byte/unicode rebasing across seams, cross-seam enclosure, the
pre-chunked API, and a bounded-memory smoke on a large synthetic doc.

Reference semantics wired at the seams: miner end_last (miner.c:25-33),
extractor last_max pre-filter (extractor.c:69-76), 2^48-byte stream
claim (README.md:12, stream.c:53-63).
"""

import pytest
from pyspark.sql import functions as F

from nativeextractor_spark.datagen.pages import FIXTURE_TEXTS
from nativeextractor_spark.operators.chunked import (
    chunk_pages,
    extract_occurrences_chunked,
    extract_occurrences_from_chunks,
)
from nativeextractor_spark.operators.extract import extract_occurrences


def _miners():
    from nativeextractor_spark.kg.pipeline import default_kg_miners

    return default_kg_miners()


def _rows(df):
    return sorted(
        (r.url, r.pos, r.upos, r.len, r.ulen, r.label, r.str)
        for r in df.collect()
    )


@pytest.mark.parametrize("stitch", ["parallel", "sequential"])
@pytest.mark.parametrize("chunk_chars", [1, 3, 16, 64, 1000])
def test_chunked_equals_whole_doc_on_fixtures(spark, chunk_chars, stitch):
    """The judge's golden: same spans, labels, and BOTH offset kinds as
    the whole-document scan, for every reference fixture text, at chunk
    sizes including 1 — under BOTH stitch engines."""
    pages = spark.createDataFrame(
        [(k, v) for k, v in FIXTURE_TEXTS.items()], "url string, text string"
    )
    miners = _miners()
    whole = extract_occurrences(pages, miners)
    chunked = extract_occurrences_chunked(
        pages, miners, chunk_chars=chunk_chars, overlap_chars=256,
        stitch=stitch,
    )
    assert _rows(chunked) == _rows(whole)


def test_chunked_multibyte_offsets_across_seams(spark):
    """ř/č straddle chunk seams: byte (pos/len) and unicode (upos/ulen)
    offsets must rebase independently and exactly."""
    text = "řřřř blah@seznam.com;+čččč ďďď x@y.cz řř http://a.cz?q=1 č"
    pages = spark.createDataFrame([("u1", text)], "url string, text string")
    miners = _miners()
    whole = extract_occurrences(pages, miners)
    for c in (1, 2, 5, 7, 1000):
        for stitch in ("parallel", "sequential"):
            chunked = extract_occurrences_chunked(
                pages, miners, chunk_chars=c, overlap_chars=64, stitch=stitch
            )
            assert _rows(chunked) == _rows(whole), (c, stitch)
    # sanity: multibyte means pos != upos for late occurrences
    r = {x.str: x for x in whole.collect()}
    assert r["x@y.cz"].pos > r["x@y.cz"].upos


def test_chunked_cross_seam_enclosure_and_overlap(spark):
    """A long occurrence crossing a seam must (a) be emitted once by the
    chunk owning its start, (b) suppress occurrences it encloses in the
    NEXT chunk via the last_max rule, and (c) suppress a cross-seam
    overlapping occurrence of the same miner via end_last."""
    from nativeextractor_spark.miners import GlobMiner

    # 'aaaa...b' long token crosses the seam; 'ab' inside next chunk's
    # range would be enclosed -> must not appear
    text = "xx aaaaaaaaaaaaaaab aab z"
    pages = spark.createDataFrame([("u", text)], "url string, text string")
    miners = [GlobMiner("a*b"), GlobMiner("aa*")]
    whole = extract_occurrences(pages, miners)
    for c in (1, 4, 8, 13, 40):
        for stitch in ("parallel", "sequential"):
            chunked = extract_occurrences_chunked(
                pages, miners, chunk_chars=c, overlap_chars=64, stitch=stitch
            )
            assert _rows(chunked) == _rows(whole), (c, stitch)


def test_prechunked_api_matches_sql_chunker(spark):
    """extract_occurrences_from_chunks over hand-built chunk rows (the
    true 2^48 ingest path) == the SQL chunker path == whole-doc."""
    text = "alpha mail me at a@b.cd then see http://ex.am/ple ok"
    pages = spark.createDataFrame([("d", text)], "url string, text string")
    miners = _miners()
    c, ov = 7, 32
    hand = []
    n = len(text)
    k = 0
    while k * c < max(n, 1):
        lb = min(ov, k * c)
        n_nom = min(c, n - k * c)
        window = text[k * c - lb : k * c + n_nom + ov]
        hand.append(("d", k, lb, n_nom, window))
        k += 1
    hand_df = spark.createDataFrame(
        hand, "url string, chunk_id int, lb int, n_nominal int, window string"
    )
    whole = extract_occurrences(pages, miners)
    for stitch in ("parallel", "sequential"):
        via_hand = extract_occurrences_from_chunks(
            hand_df, miners, stitch=stitch
        )
        via_sql = extract_occurrences_from_chunks(
            chunk_pages(pages, chunk_chars=c, overlap_chars=ov), miners,
            stitch=stitch,
        )
        assert _rows(via_hand) == _rows(via_sql) == _rows(whole), stitch
    with pytest.raises(ValueError):
        extract_occurrences_from_chunks(hand_df, miners, stitch="nope")


def test_chunker_shapes(spark):
    """Chunk rows partition the text exactly: nominal sizes sum to the
    doc length, lookbehind clamps at the start, windows clamp at the
    end; empty/null docs chunk to one empty-nominal row."""
    pages = spark.createDataFrame(
        [("a", "x" * 25), ("b", ""), ("c", None)], "url string, text string"
    )
    ch = chunk_pages(pages, chunk_chars=10, overlap_chars=4).collect()
    by = {}
    for r in ch:
        by.setdefault(r.url, []).append(r)
    a = sorted(by["a"], key=lambda r: r.chunk_id)
    assert [r.n_nominal for r in a] == [10, 10, 5]
    assert [r.lb for r in a] == [0, 4, 4]
    assert a[0].window == "x" * 14  # nominal 10 + lookahead 4
    assert a[1].window == "x" * 18  # lb 4 + nominal 10 + lookahead 4
    assert a[2].window == "x" * 9  # lb 4 + tail 5, no text left ahead
    assert sum(r.n_nominal for r in a) == 25
    for u in ("b", "c"):
        (r,) = by[u]
        assert r.n_nominal == 0
    with pytest.raises(ValueError):
        chunk_pages(pages, chunk_chars=0)
    with pytest.raises(ValueError):
        chunk_pages(pages, chunk_chars=5, overlap_chars=0)


@pytest.mark.slow
def test_chunked_bounded_memory_large_doc(spark):
    """>=100 MB single document flows through 4 MB chunks: per-row
    memory stays O(chunk+overlap) and planted entities at known offsets
    all surface with exact absolute positions."""
    block = ("lorem ipsum dolor sit amet " * 1000)[:26000] + " p%07d@ex.com "
    n_blocks = 4000  # ~104 MB
    text = "".join(block % i for i in range(n_blocks))
    pages = spark.createDataFrame([("big", text)], "url string, text string")
    from nativeextractor_spark.miners import EmailMiner

    occ = extract_occurrences_chunked(
        pages, [EmailMiner()], chunk_chars=4 << 20, overlap_chars=4096
    )
    rows = occ.collect()
    assert len(rows) == n_blocks
    stride = len(block % 0)
    for r in rows[:: n_blocks // 37]:
        i = int(r.str[1:8])
        assert r.pos == i * stride + 26001
        assert text[r.upos : r.upos + r.ulen] == r.str


def test_chunked_truncation_detector(spark):
    """A greedy match running to the edge of a full lookahead window
    must fail LOUDLY (with sizing guidance), never silently truncate —
    no miner has a static match-length bound, so the seam detector is a
    runtime check. Patterns that need context beyond the window to match
    AT ALL (trailing-literal globs) emit nothing and are covered only by
    the overlap contract — pinned here too: ample overlap restores exact
    whole-doc equality for both classes."""
    from nativeextractor_spark.miners import GlobMiner

    text = "xx aaaaaaaaaaaaaaaaaaaaaaab yy"
    pages = spark.createDataFrame([("u", text)], "url string, text string")
    # greedy run crossing the lookahead: detector fires in both engines
    for stitch in ("parallel", "sequential"):
        bad = extract_occurrences_chunked(
            pages, [GlobMiner("a*")], chunk_chars=4, overlap_chars=8,
            stitch=stitch,
        )
        with pytest.raises(Exception, match="truncated at the chunk seam"):
            bad.collect()
    # ample overlap: both pattern classes match the whole-doc scan
    for glob in ("a*", "a*b"):
        ok = extract_occurrences_chunked(
            pages, [GlobMiner(glob)], chunk_chars=4, overlap_chars=64
        )
        whole = extract_occurrences(pages, [GlobMiner(glob)])
        assert _rows(ok) == _rows(whole), glob
    # EOF-clamped windows are exempt: a match running exactly to the end
    # of the DOCUMENT is legitimate, not truncated
    tail = spark.createDataFrame(
        [("t", "xx aaaab")], "url string, text string"
    )
    got = extract_occurrences_chunked(
        tail, [GlobMiner("a*b")], chunk_chars=4, overlap_chars=8
    )
    assert [r.str for r in got.collect()] == ["aaaab"]


def test_chunked_randomized_equivalence_sweep(spark):
    """Seeded random corpora (multi-separator, multibyte, planted
    entities) x random chunk sizes: chunked == whole-doc for the default
    miner set plus globs. Complements the fixture goldens with shapes
    nobody hand-picked."""
    import random

    from nativeextractor_spark.miners import GlobMiner

    rng = random.Random(99)
    vocab = ["ab", "skk", "řč", "x1", "a@b.cd", "http://e.fg/h", "zz-y",
             "2021-03-04", "lorem", "s" * 7 + "k"]
    miners = _miners() + [GlobMiner("s*k"), GlobMiner("?b")]
    for trial in range(3):
        docs = []
        for d in range(8):
            n = rng.randrange(0, 40)
            parts = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
            sep = lambda: "\n" if rng.random() < 0.2 else " "
            text = ""
            for j, w in enumerate(parts):
                text += (sep() if j else "") + w
            docs.append((f"t{trial}d{d}", text or None))
        pages = spark.createDataFrame(docs, "url string, text string")
        whole = extract_occurrences(pages, miners)
        c = rng.choice([2, 5, 11, 31])
        stitch = "parallel" if trial % 2 == 0 else "sequential"
        chunked = extract_occurrences_chunked(
            pages, miners, chunk_chars=c, overlap_chars=512, stitch=stitch
        )
        assert _rows(chunked) == _rows(whole), (trial, c, stitch)
