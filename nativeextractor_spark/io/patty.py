"""PATTY binary Patricia-trie format: load/save parity with the reference.

Format (``/root/reference/src/patricia.c:458-521`` ``patricia_c_save`` +
``include/nativeextractor/patricia.h:42-93`` struct layouts, x86-64
alignment):

- header, 72 bytes: ``char magic[5]='PATTY'`` (+3 pad), then uint64
  ``nodes_count, edges_count, saved_str_size, size, lookup_length,
  data_lookup_length, root_offset, data_lookup_offset``;
- the lookup base string (raw bytes of the source CSV / inserted keys) —
  edges reference substrings of it by (offset, length);
- the user-data blob (``data_lookup``), its file offset recorded in the
  header;
- node records in POSTORDER (children before parents; the root record is
  last, at ``root_offset``). Node record = 16 bytes (``bool is_terminal``
  (+3 pad), ``uint32 edge_count``, ``uint64 user_data_offset``) followed by
  ``edge_count`` binary edges of 24 bytes (``uint64 str_start``,
  ``uint32 str_len`` (+4 pad), ``uint64 next_offset`` = absolute file
  offset of the child record).

Quirk preserved for byte parity: ``patricia_c_save_impl`` increments
``nodes_count`` twice per node (patricia.c:450-455), so the header records
2x the real node count.

The in-memory build mirrors ``_insert``/``_insert_edge``/``_split_edge``
(patricia.c:89-131): edges kept sorted by codepoint order (== UTF-8 byte
order), common-prefix splits on unicode char boundaries, insertion order
dependent — inserting the same CSV lines in the same order as
``patricia_c_create_from_stream`` (patricia.c:366-381) reproduces the same
tree shape.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_HEADER = struct.Struct("<5s3xQQQQQQQQ")
_NODE = struct.Struct("<B3xIQ")
_EDGE = struct.Struct("<QI4xQ")
MAGIC = b"PATTY"


@dataclass
class _Node:
    terminal: bool = False
    user_data_offset: int = 0
    # edges: list of [str_start, str_len, child], sorted (see _insert_edge)
    edges: list[list] = field(default_factory=list)


def _common_char_prefix_len(a: bytes, b: bytes) -> int:
    """_find_matching_part (patricia.c:200-218): common prefix in BYTES,
    advanced codepoint-by-codepoint (never splits a UTF-8 char)."""
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    if i == n and (len(a) == i or len(b) == i):
        return i
    # back off to the last complete char boundary (0b10xxxxxx are tails)
    while i > 0 and (a[i] if i < len(a) else b[i]) & 0xC0 == 0x80:
        i -= 1
    return i


class PattyTrie:
    """Patricia trie with the reference's insert semantics + PATTY IO."""

    def __init__(self) -> None:
        self.root = _Node()
        self.lookup = bytearray()
        self.data = bytearray()

    # -- build ------------------------------------------------------------

    def _edge_bytes(self, e: list) -> bytes:
        return bytes(self.lookup[e[0] : e[0] + e[1]])

    def _insert_edge(self, node: _Node, edge: list) -> None:
        """Sorted insert (patricia.c:63-77); UTF-8 byte order == codepoint
        order, so plain bytes comparison matches _edge_compare."""
        key = self._edge_bytes(edge)
        i = len(node.edges)
        node.edges.append(edge)
        while i > 0 and key < self._edge_bytes(node.edges[i - 1]):
            node.edges[i] = node.edges[i - 1]
            i -= 1
        node.edges[i] = edge

    def _insert(self, node: _Node, start: int, length: int) -> _Node:
        if length <= 0:
            node.terminal = True
            return node
        probe = bytes(self.lookup[start : start + length])
        for edge in node.edges:
            match = _common_char_prefix_len(self._edge_bytes(edge), probe)
            if match == 0:
                continue
            if match < edge[1]:
                # _split_edge: tail moves to a fresh intermediate node
                tail = [edge[0] + match, edge[1] - match, edge[2]]
                mid = _Node()
                self._insert_edge(mid, tail)
                edge[1] = match
                edge[2] = mid
                nxt = mid
            else:
                nxt = edge[2]
            return self._insert(nxt, start + match, length - match)
        child = _Node(terminal=True)
        self._insert_edge(node, [start, length, child])
        return child

    def insert(self, key: str, payload: bytes | None = None) -> None:
        """insert_no_lookup (patricia.c:138-155): append the key's bytes to
        the lookup base, then insert by (offset, length)."""
        raw = key.encode("utf-8")
        start = len(self.lookup)
        self.lookup.extend(raw)
        node = self._insert(self.root, start, len(raw))
        if payload is not None:
            node.user_data_offset = len(self.data)  # set_data, :535-544
            self.data.extend(payload)

    @classmethod
    def from_aliases(
        cls, aliases, payloads: dict[str, bytes] | None = None
    ) -> "PattyTrie":
        t = cls()
        for a in aliases:
            t.insert(a, (payloads or {}).get(a))
        return t

    # -- iterate / query ---------------------------------------------------

    def items(self):
        """(key, user_data_offset) per terminal node, DFS in edge order
        (traverse, patricia.c:383-418)."""

        def walk(node: _Node, prefix: bytes):
            if node.terminal:
                yield prefix.decode("utf-8"), node.user_data_offset
            for e in node.edges:
                yield from walk(e[2], prefix + self._edge_bytes(e))

        yield from walk(self.root, b"")

    def keys(self) -> list[str]:
        return [k for k, _ in self.items()]

    def search(self, probe: str) -> int:
        """patricia_c_search: matched byte length of the longest walk."""
        raw = probe.encode("utf-8")
        node, offset = self.root, 0
        while offset < len(raw):
            step = 0
            for e in node.edges:
                m = _common_char_prefix_len(self._edge_bytes(e), raw[offset:])
                if m == 0:
                    continue
                if m < e[1]:
                    return offset + m
                node, step = e[2], m
                break
            if step == 0:
                return offset
            offset += step
        return offset

    def user_data(self, key: str, size: int) -> bytes | None:
        """get() (patricia.c:523-533): payload slice for an exact terminal
        key; the C returns an unsized pointer, so the caller passes size."""
        raw = key.encode("utf-8")
        node, offset = self.root, 0
        while offset < len(raw):
            for e in node.edges:
                m = _common_char_prefix_len(self._edge_bytes(e), raw[offset:])
                if m == e[1] and m > 0:
                    node, offset = e[2], offset + m
                    break
            else:
                return None
        if not node.terminal:
            return None
        return bytes(self.data[node.user_data_offset : node.user_data_offset + size])

    # -- PATTY IO ----------------------------------------------------------

    def save(self, path: str) -> None:
        lookup = bytes(self.lookup)
        data = bytes(self.data)
        body = bytearray()
        offset = _HEADER.size + len(lookup) + len(data)
        counts = {"nodes": 0, "edges": 0}

        def write_node(node: _Node) -> int:
            nonlocal offset
            child_offsets = []
            for e in node.edges:
                child_offsets.append(write_node(e[2]))
                counts["edges"] += 1
            rec = bytearray(
                _NODE.pack(
                    1 if node.terminal else 0,
                    len(node.edges),
                    node.user_data_offset,
                )
            )
            for e, child_off in zip(node.edges, child_offsets):
                rec += _EDGE.pack(e[0], e[1], child_off)
            body.extend(rec)
            counts["nodes"] += 2  # reference double-increment quirk
            prev = offset
            offset += len(rec)
            return prev

        root_offset = write_node(self.root)
        data_lookup_offset = _HEADER.size + len(lookup) if data else 0
        header = _HEADER.pack(
            MAGIC,
            counts["nodes"],
            counts["edges"],
            0,  # saved_str_size (unused in the reference too)
            offset,
            len(lookup),
            len(data),
            root_offset,
            data_lookup_offset,
        )
        with open(path, "wb") as f:
            f.write(header)
            f.write(lookup)
            f.write(data)
            f.write(bytes(body))

    @classmethod
    def load(cls, path: str) -> "PattyTrie":
        with open(path, "rb") as f:
            blob = f.read()
        (
            magic,
            _nodes,
            _edges,
            _saved,
            size,
            lookup_len,
            data_len,
            root_offset,
            data_offset,
        ) = _HEADER.unpack_from(blob, 0)
        if magic != MAGIC:
            raise ValueError(f"{path!r} is not a PATTY file (magic={magic!r})")
        if size != len(blob):
            raise ValueError(f"truncated PATTY file: header size {size} != {len(blob)}")
        t = cls()
        t.lookup = bytearray(blob[_HEADER.size : _HEADER.size + lookup_len])
        if data_len:
            t.data = bytearray(blob[data_offset : data_offset + data_len])
        body_start = _HEADER.size + lookup_len + data_len
        if not (body_start <= root_offset < size):
            raise ValueError(
                f"corrupt PATTY file: root offset {root_offset} outside the "
                f"node section [{body_start}, {size})"
            )

        def read_node(off: int) -> _Node:
            # save() writes postorder (children strictly before parents), so
            # every child offset must lie in [body_start, off): this rejects
            # cycles and out-of-bounds offsets in corrupted/crafted files
            # with a clean error instead of RecursionError/struct.error,
            # and bounds the recursion (offsets strictly decrease).
            if off + _NODE.size > size:
                raise ValueError(
                    f"corrupt PATTY file: node at {off} exceeds size {size}"
                )
            terminal, edge_count, ud = _NODE.unpack_from(blob, off)
            if off + _NODE.size + edge_count * _EDGE.size > size:
                raise ValueError(
                    f"corrupt PATTY file: {edge_count} edges at node {off} "
                    f"exceed size {size}"
                )
            node = _Node(terminal=bool(terminal), user_data_offset=ud)
            pos = off + _NODE.size
            for _ in range(edge_count):
                s, l, nxt = _EDGE.unpack_from(blob, pos)
                if not (body_start <= nxt < off):
                    raise ValueError(
                        f"corrupt PATTY file: child offset {nxt} of node "
                        f"{off} outside postorder range [{body_start}, {off})"
                    )
                node.edges.append([s, l, read_node(nxt)])
                pos += _EDGE.size
            return node

        t.root = read_node(root_offset)
        return t


def load_alias_dict(path: str, payload_size: int = 8):
    """.patty file → :class:`~nativeextractor_spark.miners.ner.AliasDict`
    (keys + int64-LE payloads when the file carries user data).

    Supports files whose data section holds one fixed-width payload per
    terminal, as :func:`save_alias_dict` writes (all-or-none). Files with
    variable-size user data (possible from the C API, which stores opaque
    unsized pointers) are not decodable without out-of-band sizes; payload
    slices falling outside the data section raise instead of misparsing.
    """
    from nativeextractor_spark.miners.ner import AliasDict

    trie = PattyTrie.load(path)
    keys, ids = [], []
    has_data = len(trie.data) > 0
    for key, ud in trie.items():
        keys.append(key)
        if has_data:
            if ud + payload_size > len(trie.data):
                raise ValueError(
                    f"PATTY user data for key {key!r} at offset {ud} "
                    f"exceeds data section ({len(trie.data)} bytes); not a "
                    f"fixed-{payload_size}-byte-payload alias file"
                )
            raw = bytes(trie.data[ud : ud + payload_size])
            ids.append(int.from_bytes(raw, "little", signed=True))
    return AliasDict.from_aliases(keys, ids if has_data else None)


def save_alias_dict(aliases, path: str, entity_ids=None) -> None:
    """aliases (+optional int64 ids) → .patty file loadable by the C
    reference (patricia_c_from_file / mmap load path)."""
    payloads = None
    if entity_ids is not None:
        payloads = {
            a: int(i).to_bytes(8, "little", signed=True)
            for a, i in zip(aliases, entity_ids)
        }
    PattyTrie.from_aliases(aliases, payloads).save(path)
