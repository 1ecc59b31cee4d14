"""Public cursor-miner API: write custom miners against the reference's
combinator surface.

The reference's extension point is the miner API — mark/move/match
combinators over a stream cursor (``/root/reference/include/nativeextractor/
miner.h:44-297``, tutorial miner at ``README.md:261-286``). This module
exposes the same surface in Python: subclass :class:`CursorMiner` and
implement ``matcher(cursor)`` using ``match``/``match_fn``/``match_fn_plus``/
``match_string``/``match_one``/``match_delimiter``/``mark_start``/``mark_end``
— the extractor scan loop (leftmost non-overlap, failure-advance guard) is
supplied, identical to the glob engine's.

Custom miners plug into ``extract_occurrences``/``extract_triples`` like any
builtin; they are pickled to executors and run inside the Arrow kernels.
"""

from __future__ import annotations

from typing import Callable, Iterator

from nativeextractor_spark.functions.unicode import is_delimiter
from nativeextractor_spark.miners.base import Miner, Occurrence
from nativeextractor_spark.miners.glob_exact import _Cursor


class Cursor(_Cursor):
    """miner_c combinator surface over a char-indexed text cursor."""

    # match_fn (miner.c:132-144): predicate holds at the current char → move
    def match_fn(self, fn: Callable[[str], bool], move: int = 1) -> bool:
        if not self.can_move(move):
            return False
        probe = self.pos if move >= 0 else self.pos - 1
        if probe < 0 or probe >= len(self.text):
            return False
        if not fn(self.text[probe]):
            return False
        self.move(move)
        return True

    # match_fn_plus / match_fn_star (miner.c:146-173)
    def match_fn_plus(self, fn: Callable[[str], bool], move: int = 1) -> bool:
        matched = False
        while self.match_fn(fn, move):
            matched = True
        return matched

    def match_fn_star(self, fn: Callable[[str], bool], move: int = 1) -> bool:
        self.match_fn_plus(fn, move)
        return True

    # match_fn_times (miner.c:175-193): exact repetition, resets on fail
    def match_fn_times(self, fn: Callable[[str], bool], times: int, move: int = 1) -> bool:
        save = self.pos
        for _ in range(times):
            if not self.match_fn(fn, move):
                self.pos = save
                return False
        return True

    # match (single char, miner.c:195-205)
    def match(self, ch: str, move: int = 1) -> bool:
        if not self.can_move(move) or self.pos >= len(self.text):
            return False
        if self.text[self.pos] != ch:
            return False
        self.move(move)
        return True

    # match_string (miner.c:217-231): literal, resets on fail
    def match_string(self, s: str, move: int = 1) -> bool:
        save = self.pos
        for ch in s:
            if not self.match(ch, move):
                self.pos = save
                return False
        return True

    # match_one (miner.c:233-248): any one char of a set
    def match_one(self, charset: str, move: int = 1) -> bool:
        if not self.can_move(move) or self.pos >= len(self.text):
            return False
        if self.text[self.pos] in charset:
            self.move(move)
            return True
        return False


class CursorMiner(Miner):
    """Custom miner base: implement ``matcher(cursor) -> bool``.

    ``matcher`` should mark a span (``cursor.mark_start()`` /
    ``cursor.mark_end()``) and return True to emit it; the extractor scan
    loop here applies the reference's non-overlap and failure-advance rules
    (extractor.c:36-100, miner.c:25-51).
    """

    def __init__(self, label: str, prob: float = 1.0):
        self.label = label
        self.prob = prob

    def matcher(self, cursor: Cursor) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def find(self, text: str) -> Iterator[Occurrence]:
        n = len(text)
        pos = 0
        guard = 0
        end_last = 0
        while pos < n:
            if pos >= guard:
                cur = Cursor(text, pos, end_last)
                ok = self.matcher(cur)
                occ = cur.make_occurrence() if ok else None
                if occ is not None:
                    end_last = occ[1]
                    yield Occurrence(occ[0], occ[1], self.label, self.prob)
                guard = max(
                    cur.end if cur.end is not None else 0, cur.pos, end_last
                )
            pos += 1


class HelloMiner(CursorMiner):
    """The reference tutorial miner (README.md:261-286): matches a literal
    word as a standalone token."""

    def __init__(self, word: str = "hello", label: str = "Hello"):
        super().__init__(label)
        self.word = word

    def matcher(self, cursor: Cursor) -> bool:
        if not cursor.mark_start():
            return False
        if not cursor.match_string(self.word):
            return False
        if not cursor.mark_end():
            return False
        # token must end here (delimiter or EOF)
        return cursor.match_delimiter(1) or not cursor.can_move(1)
