"""PATTY binary trie format round-trip + search parity (S8)."""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from nativeextractor_spark.io.patty import (
    MAGIC,
    PattyTrie,
    load_alias_dict,
    save_alias_dict,
)
from nativeextractor_spark.miners.ner import AliasDict

WORDS = ["praha", "prague", "pra", "brno", "br", "řeka", "řečiště", "a"]


def test_roundtrip_keys_and_payloads(tmp_path):
    path = str(tmp_path / "dict.patty")
    save_alias_dict(WORDS, path, entity_ids=range(len(WORDS)))
    d = load_alias_dict(path)
    assert sorted(k.decode() for k in d.keys) == sorted(set(WORDS))
    for i, w in enumerate(WORDS):
        assert d.lookup(w.encode()) == i


def test_header_layout(tmp_path):
    """Byte-level header contract (patricia.h:74-93 + save quirks)."""
    path = str(tmp_path / "t.patty")
    t = PattyTrie.from_aliases(["ab", "ac"])
    t.save(path)
    blob = open(path, "rb").read()
    magic, nodes, edges, saved, size, lookup_len, data_len, root_off, data_off = (
        struct.unpack_from("<5s3xQQQQQQQQ", blob, 0)
    )
    assert magic == MAGIC
    assert size == len(blob)
    assert lookup_len == len(b"abac")
    assert data_len == 0 and data_off == 0
    # tree: root -> 'a' -> {'b','c'}: 4 nodes, 3 edges; nodes_count is
    # double-incremented by the reference writer (patricia.c:450-455)
    assert edges == 3
    assert nodes == 8
    # root record is written last (postorder)
    assert root_off == size - (16 + 24)


def test_trie_search_matches_aliasdict():
    t = PattyTrie.from_aliases(WORDS)
    d = AliasDict.from_aliases(WORDS)
    probes = ["praha", "prah", "prax", "brnox", "ře", "řekax", "zzz", "", "a"]
    got = [t.search(p) for p in probes]
    want = list(d.longest_prefix([p.encode() for p in probes]))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    keys=st.lists(
        st.text(alphabet="abřč", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    probes=st.lists(
        st.text(alphabet="abřčx", min_size=0, max_size=8), min_size=1, max_size=8
    ),
)
def test_patty_search_parity_property(tmp_path_factory, keys, probes):
    """Loaded-from-disk trie search == sorted-array AliasDict probe, for
    random UTF-8 keys (the D3 equivalence the Spark design rests on)."""
    path = str(tmp_path_factory.mktemp("patty") / "p.patty")
    PattyTrie.from_aliases(keys).save(path)
    t = PattyTrie.load(path)
    d = AliasDict.from_aliases(keys)
    got = [t.search(p) for p in probes]
    want = list(d.longest_prefix([p.encode() for p in probes]))
    assert got == want
    assert sorted(t.keys()) == sorted(set(keys))


def test_load_rejects_non_patty(tmp_path):
    bad = tmp_path / "bad.patty"
    bad.write_bytes(b"NOPE" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not a PATTY"):
        PattyTrie.load(str(bad))


def test_user_data_slices():
    t = PattyTrie.from_aliases(
        ["ab", "cd"], payloads={"ab": b"12345678", "cd": b"abcdefgh"}
    )
    assert t.user_data("ab", 8) == b"12345678"
    assert t.user_data("cd", 8) == b"abcdefgh"
    assert t.user_data("zz", 8) is None


def test_load_rejects_cyclic_offsets(tmp_path):
    """A crafted file whose edge offsets don't strictly decrease (postorder)
    must raise ValueError, not RecursionError."""
    import pytest

    from nativeextractor_spark.io.patty import _EDGE, _HEADER, _NODE, MAGIC, PattyTrie

    p = tmp_path / "cyclic.patty"
    PattyTrie.from_aliases(["ab", "ac"]).save(str(p))
    blob = bytearray(p.read_bytes())
    (_m, _n, _e, _s, size, lookup_len, data_len, root, _do) = _HEADER.unpack_from(blob, 0)
    # point the root's first edge at the root itself → cycle
    edge_pos = root + _NODE.size
    s, l, _nxt = _EDGE.unpack_from(blob, edge_pos)
    _EDGE.pack_into(blob, edge_pos, s, l, root)
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="postorder"):
        PattyTrie.load(str(p))


def test_load_rejects_out_of_bounds_child(tmp_path):
    import pytest

    from nativeextractor_spark.io.patty import _EDGE, _HEADER, _NODE, PattyTrie

    p = tmp_path / "oob.patty"
    PattyTrie.from_aliases(["ab", "ac"]).save(str(p))
    blob = bytearray(p.read_bytes())
    (_m, _n, _e, _s, size, lookup_len, data_len, root, _do) = _HEADER.unpack_from(blob, 0)
    edge_pos = root + _NODE.size
    s, l, _nxt = _EDGE.unpack_from(blob, edge_pos)
    _EDGE.pack_into(blob, edge_pos, s, l, size + 1000)
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="postorder"):
        PattyTrie.load(str(p))


def test_load_alias_dict_rejects_out_of_range_payload(tmp_path):
    """Terminals whose payload slice exceeds the data section raise instead
    of silently decoding bytes from offset 0."""
    import pytest

    from nativeextractor_spark.io.patty import load_alias_dict, save_alias_dict

    p = tmp_path / "short.patty"
    save_alias_dict(["aa", "bb"], str(p), entity_ids=[1, 2])
    with pytest.raises(ValueError, match="data section"):
        load_alias_dict(str(p), payload_size=64)
