"""Counting-sketch candidate prefilter for corpus-wide duplicate keys.

The singleton-elimination pre-pass for ExactSubstr-style span dedup
(``textops.spans``): in a typical web corpus the overwhelming majority of
token n-grams occur exactly once, yet a naive global duplicate count
shuffles every 8-byte gram key across the cluster. This module finds a
SUPERSET of the duplicated keys without any key shuffle, so only that
superset (true duplicates + a few-percent false-positive tail) reaches
the exact count:

1. **build** — one narrow pass over the key column. Each input partition
   builds two bit-planes over a shared ``m``-bit hash space
   (``num_hashes`` positions per key, double hashing):
   ``seen`` (positions touched by any key in the partition) and
   ``twice`` (positions of keys occurring >= 2 times WITHIN the
   partition). One row per partition, two packed byte blobs.
2. **merge** — the driver folds the partition planes into one candidate
   plane ``C``: a position is set when some partition saw it twice, or
   when two DIFFERENT partitions both saw it
   (``C |= twice | (seen_so_far & seen)``).
3. **filter** — ``C`` is broadcast (a bit array, ``m/8`` bytes); a
   vectorized Arrow kernel keeps only rows whose key has ALL
   ``num_hashes`` positions set in ``C``.

Guarantees: **no false negatives** — a key with global count >= 2 is
either duplicated within some partition (``twice``) or present in two
partitions (``seen & seen``), so all its positions are set in ``C``.
False positives (hash saturation) pass the filter and are eliminated by
the exact downstream count; they cost shuffle volume only. With the
default 8 bits/key and 3 hashes the singleton pass-through rate is ~3%.

Scale envelope (honest): the plane is sized at ``bits_per_key`` x the
corpus key count and must fit in one broadcast — practical to ~10^9
distinct keys (~1 GB plane), i.e. TB-scale text per job. The per-round
driver merge moves one plane per input partition to the driver; on a
real cluster that fold is the natural candidate for a treeAggregate
(partial merges on executors) — the plane OR/AND algebra is associative.
Beyond the broadcast envelope callers fall back to the plain global
count (``prefilter="auto"`` does this automatically).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIN_BITS = 1 << 16
_WORD = np.uint64(63)


def plane_bits(est_keys: int, bits_per_key: int = 8) -> int:
    """Plane size in bits: next power of two >= bits_per_key * est_keys
    (power-of-two so position extraction is a mask, not a modulo)."""
    want = max(int(est_keys) * int(bits_per_key), _MIN_BITS)
    m = _MIN_BITS
    while m < want:
        m <<= 1
    return m


def _positions(keys: np.ndarray, m_bits: int, num_hashes: int):
    """Double-hashed positions, shape (num_hashes, len(keys)) uint64.
    xxhash64 keys are already uniform; the second hash is a golden-ratio
    multiply forced odd so the probe sequence walks the whole space."""
    mask = np.uint64(m_bits - 1)
    u = keys.view(np.uint64)
    with np.errstate(over="ignore"):
        h2 = (u * _GOLD) | np.uint64(1)
        return [(u + np.uint64(j) * h2) & mask for j in range(num_hashes)]


def _set_bits(plane: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        plane, (pos >> np.uint64(6)).astype(np.int64),
        np.left_shift(np.uint64(1), pos & _WORD),
    )


def _test_bits(plane: np.ndarray, pos: np.ndarray) -> np.ndarray:
    word = plane[(pos >> np.uint64(6)).astype(np.int64)]
    return (word >> (pos & _WORD)) & np.uint64(1) != 0


def build_candidate_plane(
    keys_df: DataFrame,
    key_col: str,
    est_keys: int,
    bits_per_key: int = 8,
    num_hashes: int = 3,
) -> tuple[bytes, int]:
    """One pass over ``keys_df[key_col]`` (LONG keys, e.g. xxhash64
    output): returns ``(plane_bytes, m_bits)`` where the plane has every
    position of every globally-duplicated key set (plus false
    positives). One (seen, twice) plane pair per input partition is
    collected and folded on the driver (see module docstring for the
    cluster-scale treeAggregate note)."""
    import pandas as pd

    m_bits = plane_bits(est_keys, bits_per_key)
    n_words = m_bits // 64
    k = num_hashes

    def kernel(batches):
        chunks = []
        for pdf in batches:
            if len(pdf):
                chunks.append(pdf[key_col].to_numpy(dtype="int64"))
        seen = np.zeros(n_words, dtype=np.uint64)
        twice = np.zeros(n_words, dtype=np.uint64)
        if chunks:
            keys = np.concatenate(chunks)
            uniq, counts = np.unique(keys, return_counts=True)
            for pos in _positions(uniq, m_bits, k):
                _set_bits(seen, pos)
            dup = uniq[counts > 1]
            if len(dup):
                for pos in _positions(dup, m_bits, k):
                    _set_bits(twice, pos)
        yield pd.DataFrame(
            {"seen": [seen.tobytes()], "twice": [twice.tobytes()]}
        )

    rows = keys_df.select(key_col).mapInPandas(
        kernel, schema="seen binary, twice binary"
    ).collect()
    cand = np.zeros(n_words, dtype=np.uint64)
    seen_any = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        seen = np.frombuffer(r["seen"], dtype=np.uint64)
        twice = np.frombuffer(r["twice"], dtype=np.uint64)
        cand |= twice | (seen_any & seen)
        seen_any |= seen
    return cand.tobytes(), m_bits


def filter_candidates(
    df: DataFrame,
    key_col: str,
    plane_bytes: bytes,
    m_bits: int,
    num_hashes: int = 3,
) -> DataFrame:
    """Rows of ``df`` whose LONG ``key_col`` tests positive in the
    candidate plane (all ``num_hashes`` positions set). Schema
    preserved; the plane rides as a Spark broadcast and is viewed
    zero-copy per batch."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(plane_bytes)
    k = num_hashes
    schema = df.schema

    def kernel(batches):
        plane = np.frombuffer(bc.value, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            keys = pdf[key_col].to_numpy(dtype="int64")
            keep = np.ones(len(keys), dtype=bool)
            for pos in _positions(keys, m_bits, k):
                keep &= _test_bits(plane, pos)
            yield pdf[keep]

    return df.mapInPandas(kernel, schema=schema)
