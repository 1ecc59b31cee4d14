"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side DataFrame expressions (whole-stage codegen);
the only Python is the vectorized SimHash kernel. Hash flavors used in the
SQL-oracle-checkable operators are md5-based so DuckDB can reproduce them
bit-for-bit; the scale flavor swaps in xxhash64 (cheaper) without changing
the plan shape.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nativeextractor_spark.staging import stage


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per sha256(text) group.

    One shuffle on the digest; partial aggregation is map-side. Returns
    (doc_id, text_hash, group_size).
    """
    from nativeextractor_spark.operators.extract import coalesce_for_kernel

    h = F.sha2(F.col(text_col), 256).alias("text_hash")
    return (
        # tiny-split inputs otherwise pay one shuffle-map-task setup per
        # split (guide §2.2: fewer, larger map tasks; bytes-capped no-op
        # at real volumes)
        coalesce_for_kernel(df.select(F.col(id_col).alias("doc_id"), h))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("group_size"),
        )
        .select("doc_id", "text_hash", "group_size")
    )


def _shingle_expr(text_col: str, k: int, shingle: str = "char"):
    """array of all k-shingles of lower(text) — pure JVM expression.

    ``shingle="char"``: k-char substrings (the oracle-reproducible flavor).
    ``shingle="word"``: k consecutive whitespace tokens joined — an
    order-of-magnitude fewer shingles per web page, the standard choice for
    corpus-scale dedup where the hash work dominates the scan.
    """
    if shingle == "char":
        return F.expr(
            f"transform(sequence(1, greatest(length(lower({text_col})) - {k - 1}, 1)),"
            f" i -> substring(lower({text_col}), i, {k}))"
        )
    if shingle == "word":
        # split on the whitespace CLASS and drop empty tokens so tabs/newlines
        # and space runs shingle identically across whitespace variants
        toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
        return F.expr(
            f"transform(sequence(1, greatest(size({toks}) - {k - 1}, 1)),"
            f" i -> array_join(slice({toks}, i, {k}), ' '))"
        )
    raise ValueError(f"unknown shingle flavor {shingle!r}")


def _shingle_arrays(
    df: DataFrame, text_col: str, id_col: str, k: int, shingle: str
) -> DataFrame:
    """(doc_id, shingles) for every shingle flavor. ``word_hash`` (the
    fastest scale flavor, r3) identifies a shingle by an xxhash64 combine
    of its k member TOKEN HASHES instead of a built k-token string — no
    per-shingle slice+join allocations, measured 7-8x faster than the
    string flavor on the 50k-page table. Shared by :func:`minhash_bands`
    and the exact-Jaccard pair verification (r5)."""
    from nativeextractor_spark.operators.extract import coalesce_for_kernel

    df = coalesce_for_kernel(df)
    if shingle == "word_hash":
        toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
        combine = ", ".join(f"try_element_at(_th, i + {j})" for j in range(k))
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(f"transform({toks}, t -> xxhash64(t))").alias("_th"),
        ).select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, greatest(size(_th) - {k - 1}, 1)),"
                f" i -> xxhash64({combine}))"
            ).alias("shingles"),
        )
    return df.select(
        F.col(id_col).alias("doc_id"),
        _shingle_expr(text_col, k, shingle).alias("shingles"),
    )


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    k: int = 5,
    hash_flavor: str = "md5",
    shingle: str = "char",
) -> DataFrame:
    """MinHash signature rows (doc_id, band, min_hash).

    min_hash_i = min over shingles of hash(i || shingle); banding with r=1
    rows/band. Hash flavors: ``md5`` is reproducible in ANSI SQL (DuckDB
    oracle); ``xx64`` is the scale path. Shingle flavors: ``char``/``word``
    build shingle STRINGS; ``word_hash`` (r3, xx64-only) identifies a
    shingle by an xxhash64 combine of its token hashes — no per-shingle
    string allocation, measured 7-8x faster on the 50k-page table. All
    flavors stay entirely JVM-side.
    """
    bands = F.array(*[F.lit(i) for i in range(num_hashes)])
    if hash_flavor == "md5":
        hash_fn = lambda s: F.md5(F.concat(F.col("band").cast("string"), s))
    elif hash_flavor == "xx64":
        hash_fn = lambda s: F.xxhash64(F.col("band"), s)
    else:
        raise ValueError(f"unknown hash_flavor {hash_flavor!r}")
    if shingle == "word_hash" and hash_flavor != "xx64":
        # long-typed shingles require the xx64 band hash
        raise ValueError("shingle='word_hash' requires hash_flavor='xx64'")
    base = _shingle_arrays(df, text_col, id_col, k, shingle)
    # NOTE the explode-then-hash shape is deliberate: the GenerateExec
    # materializes the shingle array once per document and the per-band rows
    # reference it. Computing all band minhashes in one projection reads
    # nicer but CollapseProject inlines the (expensive) shingling expression
    # into every band column — 4x the split/join work, measured 4-5x slower.
    return (
        base.select("doc_id", F.explode(bands).alias("band"), "shingles")
        .select(
            "doc_id",
            "band",
            F.array_min(F.transform("shingles", hash_fn)).alias("min_hash"),
        )
    )


def lsh_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    k: int = 5,
    min_shared_bands: int = 2,
    max_bucket: int = 200,
    hash_flavor: str = "md5",
    shingle: str = "char",
    verify_jaccard: float | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs: docs sharing ≥ min_shared_bands LSH
    buckets. Oversized buckets are dropped (bounded skew). Returns
    (doc_a, doc_b, shared_bands); with ``verify_jaccard`` set, each
    candidate pair is additionally verified against the exact shingle-set
    Jaccard (same flavor the minhashes sampled) and the output gains a
    ``jaccard`` column — the defense against transitive CC chaining of
    borderline band collisions at corpus scale (see the inline note)."""
    if hash_flavor not in ("md5", "xx64"):
        raise ValueError(f"unknown hash_flavor {hash_flavor!r}")
    if shingle == "word_hash" and hash_flavor != "xx64":
        # long-typed shingles require the xx64 band hash (minhash_bands
        # enforces this on the unverified path; the verified path must too)
        raise ValueError("shingle='word_hash' requires hash_flavor='xx64'")
    sets = None
    if verify_jaccard is not None:
        # r8: with verification on, shingle the corpus ONCE — stage the
        # distinct shingle arrays and derive the band minhashes FROM the
        # staged arrays (elementwise hash + min is invariant under
        # duplicate removal, so min over the distinct set equals
        # minhash_bands' min over the raw multiset). The r5-r7 shape ran a
        # SECOND full shingling pass just to build the verification sets.
        sets = (
            _shingle_arrays(df, text_col, id_col, k, shingle)
            .select("doc_id", F.array_distinct("shingles").alias("_sh"))
            .transform(stage("dedup"))
        )
        # all band minhashes in ONE projection then posexplode (r8): _sh
        # is a STAGED column here, so hash-then-explode cannot trigger the
        # CollapseProject re-shingling trap that forces minhash_bands'
        # explode-then-hash order — and the per-band rows stop carrying
        # (and copying) the full shingle array through the Generate
        if hash_flavor == "xx64":
            mh = (
                f"transform(sequence(0, {num_hashes - 1}),"
                " b -> array_min(transform(_sh, s -> xxhash64(b, s))))"
            )
        else:  # md5
            mh = (
                f"transform(sequence(0, {num_hashes - 1}),"
                " b -> array_min(transform(_sh,"
                " s -> md5(concat(cast(b as string), s)))))"
            )
        bands = (
            sets.select(
                "doc_id", F.posexplode(F.expr(mh)).alias("band", "min_hash")
            )
            .transform(stage("dedup"))
        )
    else:
        # materialize the (small: num_hashes rows/doc) band table once —
        # the bucket sizing, the bounded join, and BOTH self-join sides
        # consume it; without truncation each re-runs the full
        # shingling/minhash scan
        bands = minhash_bands(
            df, text_col, id_col, num_hashes, k, hash_flavor, shingle
        ).transform(stage("dedup"))
    sizes = bands.groupBy("band", "min_hash").agg(F.count("*").alias("_sz"))
    bounded = bands.join(
        sizes.where(F.col("_sz") <= max_bucket).drop("_sz"), ["band", "min_hash"]
    )
    a = bounded.select("band", "min_hash", F.col("doc_id").alias("doc_a"))
    b = bounded.select("band", "min_hash", F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, ["band", "min_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_bands"))
        .where(F.col("shared_bands") >= min_shared_bands)
    )
    if verify_jaccard is None:
        return pairs
    # r5: exact-Jaccard verification of the candidate pairs (the same
    # pattern canonicalize_surfaces always used). Shared-band counting is
    # probabilistic — at corpus scale, borderline band collisions between
    # genuinely-distinct documents chain transitively through connected
    # components and keep-min then removes whole chained clusters
    # (measured: 36% of distinct synthetic pages dropped at sf1 under the
    # defaults, BENCH/BASELINE.md). Verification computes true Jaccard
    # over the SAME shingle sets the minhashes sampled (the staged arrays
    # above) and keeps only pairs >= the threshold — per-pair exact set
    # intersection on the (already bucket-capped) candidate set, never
    # all-pairs. Output gains a ``jaccard`` column (rounded to 6 decimals).
    verified = (
        pairs.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("_sh").alias("_sa")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("_sh").alias("_sb")),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(
        inter.cast("double") / union
    )
    # threshold on the UNROUNDED jaccard (the rounding is presentation
    # only): both engines then compare the identical IEEE double
    # (double)inter / (double)union, with no round-mode edge at the
    # threshold boundary — the DuckDB oracle mirrors this order (r6)
    return (
        verified.where(jac >= verify_jaccard)
        .withColumn("jaccard", F.round(jac, 6))
        .select("doc_a", "doc_b", "shared_bands", "jaccard")
    )


def _simhash_tokens_sql(text_col: str) -> str:
    """Distinct lowercase whitespace tokens as a SQL array expression.

    Matches the kernel's ``text.lower().split()`` on ASCII corpora (the
    contract corpus is pinned single-spaced lowercase). Known divergence on
    exotic input: Java ``\\s`` excludes Unicode spaces like U+00A0 that
    Python ``str.split()`` treats as separators."""
    return f"array_distinct(filter(split(lower({text_col}), '\\\\s+'), t -> t <> ''))"


def _simhash_hashes_sql(toks: str, token_hash: str) -> str:
    """array<bigint> of 64-bit token hashes, entirely JVM-side.

    ``md5``: first 16 hex chars of md5(token) as a signed-64 reinterpret
    (two 32-bit conv halves OR'd — conv output above 2^63-1 won't cast);
    ``xx64``: xxhash64 (the cheap scale flavor; not oracle-reproducible)."""
    if token_hash == "md5":
        return (
            f"transform(transform({toks}, t -> substring(md5(t), 1, 16)),"
            " x -> shiftleft(cast(conv(substring(x, 1, 8), 16, 10) as bigint), 32)"
            " | cast(conv(substring(x, 9, 8), 16, 10) as bigint))"
        )
    if token_hash == "xx64":
        return f"transform({toks}, t -> xxhash64(t))"
    raise ValueError(f"unknown token_hash {token_hash!r}")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    token_hash: str = "md5",
    engine: str = "project",
) -> DataFrame:
    """64-bit SimHash over distinct whitespace tokens. Returns
    (doc_id, simhash) with the signature reinterpreted as a signed long.

    SimHash is a full-corpus map pass, so the hot path must stay JVM-side.
    All three engines produce bit-identical signatures (pinned by
    tests/test_textops.py cross-engine test):

    - ``engine="project"`` (default): zero-shuffle single projection — a
      higher-order ``aggregate`` folds token hashes into a 64-slot vote
      array per row, entirely inside the scan stage. No exchange, no
      Python. Measured 1.5 s on the sf0.1 pages table (local[32]).
    - ``engine="agg"``: explode distinct tokens, hash in JVM, accumulate
      the 64 bit votes as 64 whole-stage-codegen ``sum`` aggregates with
      map-side partial aggregation — shuffles one 64-column row per
      document per input partition. Measured 3.0 s on sf0.1: the codegen
      sums don't beat the HOF fold because the explode multiplies rows
      64-fold through the aggregate operator.
    - ``engine="kernel"``: the original Arrow/NumPy kernel (also the only
      engine for ``token_hash="blake2b"``, which SQL cannot express);
      digests are cached per batch-unique token. Measured 0.9 s on sf0.1 —
      fastest single-node, but pays the Arrow text transfer into Python
      workers, which the JVM engines avoid at cluster scale.

    Token hash flavors: ``md5`` = first 8 bytes of md5(token), reproducible
    in ANSI SQL so the signature is oracle-checkable; ``xx64`` = xxhash64
    (cheapest, JVM engines only); ``blake2b`` = blake2b-8 (kernel only).
    """
    if engine not in ("project", "agg", "kernel"):
        raise ValueError(f"unknown engine {engine!r}")
    if token_hash == "blake2b" or engine == "kernel":
        # blake2b has no SQL expression — kernel is the only engine for it
        return _simhash_kernel(df, text_col, id_col, bits, token_hash)
    toks = _simhash_tokens_sql(text_col)
    hashes = _simhash_hashes_sql(toks, token_hash)
    if engine == "project":
        # empty/null token arrays fold to all-zero votes -> signature 0,
        # matching the kernel's empty-doc behavior without a second scan
        # of the (expensive) tokenization expression in a CASE guard
        sig = (
            f"aggregate(coalesce({hashes}, cast(array() as array<bigint>)),"
            f" array_repeat(cast(0 as bigint), {bits}),"
            f" (acc, h) -> zip_with(acc, sequence(0, {bits - 1}),"
            "   (a, i) -> a + (cast(shiftrightunsigned(h, i) & 1 as bigint) * 2 - 1)),"
            f" acc -> aggregate(zip_with(acc, sequence(0, {bits - 1}),"
            "   (v, i) -> if(v > 0, shiftleft(cast(1 as bigint), i),"
            "             cast(0 as bigint))),"
            "   cast(0 as bigint), (a, x) -> a | x))"
        )
        return df.select(
            F.col(id_col).alias("doc_id"), F.expr(sig).alias("simhash")
        )
    # engine == "agg" (validated above):
    # explode_outer keeps empty docs as a null-token row; every vote sum is
    # then NULL for that doc and the final bit test (NULL > 0 = false)
    # yields signature 0 — kernel parity without a separate branch
    tok_rows = df.select(
        F.col(id_col).alias("doc_id"), F.expr(hashes).alias("_hs")
    ).select("doc_id", F.explode_outer("_hs").alias("_h"))
    votes = tok_rows.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftrightunsigned(F.col("_h"), i)
                .bitwiseAND(F.lit(1))
                .cast("long")
                * 2
                - 1
            ).alias(f"_v{i}")
            for i in range(bits)
        ]
    )
    sig_col = F.lit(0).cast("long")
    for i in range(bits):
        sig_col = sig_col.bitwiseOR(
            F.when(
                F.col(f"_v{i}") > 0,
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc_id", sig_col.alias("simhash"))


def _simhash_kernel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    token_hash: str = "md5",
) -> DataFrame:
    """Arrow/NumPy SimHash kernel (see :func:`simhash` engine="kernel")."""
    import hashlib

    if token_hash == "md5":
        tok_h = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
    elif token_hash == "blake2b":
        tok_h = lambda t: int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
        )
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # digest each batch-unique token once (web corpora repeat
            # tokens heavily across documents in a batch)
            cache: dict[str, int] = {}

            def h(t: str) -> int:
                v = cache.get(t)
                if v is None:
                    v = tok_h(t)
                    cache[t] = v
                return v

            ids, out = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                tokens = (text or "").lower().split()
                if not tokens:
                    ids.append(did)
                    out.append(0)
                    continue
                hs = np.fromiter(
                    (h(t) for t in set(tokens)),
                    dtype=np.uint64,
                )
                bit_matrix = (hs[:, None] >> np.arange(bits, dtype=np.uint64)) & 1
                # int64: uint64 arithmetic would wrap negative vote tallies
                votes = bit_matrix.sum(axis=0).astype(np.int64) * 2 - hs.size
                sig = np.uint64(0)
                for i in np.flatnonzero(votes > 0):
                    sig |= np.uint64(1) << np.uint64(i)
                ids.append(did)
                out.append(int(np.int64(sig)))  # reinterpret as signed for Spark long
            yield pd.DataFrame({"doc_id": ids, "simhash": out})

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(kernel, schema="doc_id long, simhash long")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_token_freq: int = 1000,
    gram_key: str = "string",
) -> DataFrame:
    """Exact n-gram (word) Jaccard similarity pairs ≥ threshold.

    Inverted-index join on distinct n-grams: |A∩B| via groupBy count, sizes
    joined in, Jaccard = inter / (|A| + |B| - inter). N-grams appearing in
    more than ``max_token_freq`` docs are stop-listed (skew bound).
    Returns (doc_a, doc_b, jaccard).

    ``gram_key``: ``"string"`` (default) joins on the gram text — the
    oracle-reproducible flavor; ``"hash"`` joins on an xxhash64 combine of
    the member token hashes — 8-byte shuffle keys instead of ~n-word
    strings and no per-gram string allocation, the corpus-scale flavor
    (Jaccard over hashed grams equals Jaccard over grams up to xxhash64
    collisions, ~2^-64 per pair).
    """
    if gram_key == "hash":
        toks = f"transform(split(lower({text_col}), ' '), t -> xxhash64(t))"
        combine = ", ".join(f"try_element_at(_th, i + {j})" for j in range(n))
        gram_expr = (
            f"transform(sequence(1, greatest(size(_th) - {n - 1}, 1)),"
            f" i -> xxhash64({combine}))"
        )
        grams = (
            df.select(
                F.col(id_col).alias("doc_id"), F.expr(toks).alias("_th")
            )
            .select(
                "doc_id",
                F.explode(F.array_distinct(F.expr(gram_expr))).alias("gram"),
            )
        )
    elif gram_key == "string":
        grams = (
            df.select(
                F.col(id_col).alias("doc_id"),
                F.explode(
                    F.array_distinct(
                        F.expr(
                            f"transform(sequence(1, greatest(size(split(lower({text_col}), ' ')) - {n - 1}, 1)),"
                            f" i -> array_join(slice(split(lower({text_col}), ' '), i, {n}), ' '))"
                        )
                    )
                ).alias("gram"),
            )
        )
    else:
        raise ValueError(f"unknown gram_key {gram_key!r}")
    freq = grams.groupBy("gram").agg(F.countDistinct("doc_id").alias("_df"))
    # materialize the stop-listed gram table once — sizes and BOTH self-join
    # sides consume it (3x the gram scan otherwise)
    grams = grams.join(
        freq.where(F.col("_df") <= max_token_freq).drop("_df"), "gram"
    ).transform(stage("dedup"))
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    a = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    b = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_chunks: int = 4,
    token_hash: str = "md5",
    max_bucket: int = 1000,
    engine: str = "project",
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole blocking: the 64-bit signature splits into ``n_chunks``
    bit-chunks; any pair differing in fewer than ``n_chunks`` bits shares at
    least one IDENTICAL chunk, so for ``max_hamming < n_chunks`` the chunk
    equi-join finds EVERY qualifying pair — exact, never all-pairs.
    Oversized chunk buckets are dropped (the standard skew cap; a dropped
    bucket is a documented recall loss, never an OOM). Verification is
    ``bit_count(xor)`` — pure JVM. Returns (doc_a, doc_b, hamming).
    """
    if max_hamming >= n_chunks:
        raise ValueError("pigeonhole blocking needs max_hamming < n_chunks")
    width = 64 // n_chunks
    mask = (1 << width) - 1
    sigs = simhash(
        df, text_col, id_col, token_hash=token_hash, engine=engine
    ).transform(stage("dedup"))
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"shiftright(simhash, {i * width}) & {mask}")
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    sizes = chunks.groupBy("chunk_id", "chunk").agg(F.count("*").alias("_sz"))
    bounded = chunks.join(
        sizes.where(F.col("_sz") <= max_bucket).drop("_sz"),
        ["chunk_id", "chunk"],
    )
    a = bounded.select(
        "chunk_id", "chunk",
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("_sa"),
    )
    b = bounded.select(
        "chunk_id", "chunk",
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("_sb"),
    )
    pairs = (
        a.join(b, ["chunk_id", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "_sa", "_sb")
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
