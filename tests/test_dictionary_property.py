"""Randomized dictionary tests mirroring the reference Patricia suite.

The reference tests the trie with 10,000 random ASCII and 10,000 random
UTF-8 words (seeded), asserting insert→search roundtrips, prefix search, and
user-data get/set (/root/reference/tests/patricia.c:26-175). Our sorted-array
gazetteer must satisfy the same contract: ``longest_prefix`` is the trie's
longest-path search (D3), payloads are terminal-node user data (D6).
"""

import random

import numpy as np
import pytest

from nativeextractor_spark.miners import AliasDict


def _random_words(rng, n, unicode_chars=False):
    words = set()
    alphabet = (
        [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ([chr(c) for c in range(0x100, 0x180)] if unicode_chars else [])
    )
    while len(words) < n:
        words.add("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16))))
    return sorted(words)


@pytest.mark.parametrize("unicode_chars", [False, True])
def test_insert_search_roundtrip_10k(unicode_chars):
    """patricia.c:50-62 analogue: every inserted word fully matches itself."""
    rng = random.Random(0)  # srand(0) like the reference
    words = _random_words(rng, 10_000, unicode_chars)
    d = AliasDict.from_aliases(words, list(range(len(words))))
    probes = [w.encode("utf-8") for w in words]
    matched = d.longest_prefix(probes)
    lens = np.array([len(p) for p in probes])
    assert (matched == lens).all()


def test_prefix_search():
    """patricia.c:77-97 analogue: probes sharing a prefix with a key report
    exactly the common-prefix length."""
    d = AliasDict.from_aliases(["alphabet", "alpine", "beta"])
    cases = {
        b"alphabetical": 8,  # full key 'alphabet' is a prefix of the probe
        b"alpha": 5,
        b"alp": 3,
        b"alpinism": 5,
        b"betamax": 4,
        b"gamma": 0,
        b"": 0,
    }
    got = d.longest_prefix(list(cases))
    for (probe, expect), g in zip(cases.items(), got):
        assert g == expect, probe


def test_user_data_roundtrip_10k():
    """patricia.c:166-175 analogue: per-key payload get/set."""
    rng = random.Random(0)
    words = _random_words(rng, 10_000)
    ids = [rng.randrange(1 << 40) for _ in words]
    d = AliasDict.from_aliases(words, ids)
    for w, i in list(zip(words, ids))[::97]:
        assert d.lookup(w.encode("utf-8")) == i
    assert d.lookup(b"definitely-not-a-key!") is None


def test_sorted_invariant():
    """patricia.c:99-117 analogue: the key array is sorted (enables the
    binary search that replaces trie edge walks)."""
    rng = random.Random(1)
    d = AliasDict.from_aliases(_random_words(rng, 2_000, True))
    keys = list(d.keys)
    assert keys == sorted(keys)
