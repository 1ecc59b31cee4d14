"""Regex→NFA→DFA compiler parity tests (reference R1-R5 + run-to-stuck)."""

import pytest

from nativeextractor_spark.miners.regex_dfa import (
    DfaMiner,
    RegexParseError,
    compile_regex,
)

FIXTURE_REGEX_0 = "asds ad +919367788755 asdad\nadsadas test@gmail.com asds sdščččč---"


def _matches(pattern, text):
    m = DfaMiner("X", pattern)
    return [text[o.ustart : o.uend] for o in m.find(text)]


def test_reference_fixture_email_tel():
    """tests/regex_miner.c:71-91 — the two reference regexes, exactly 2 hits."""
    email = DfaMiner("EMAIL", r"[^@ \t\r\n]+@[^@ \t\r\n]+\.[^@ \t\r\n]+")
    tel = DfaMiner("TEL_NO", r"[+]?[(]?[0-9]{3}[)]?[-\s.]?[0-9]{3}[-\s.]?[0-9]{4,6}")
    occs = list(email.find(FIXTURE_REGEX_0)) + list(tel.find(FIXTURE_REGEX_0))
    got = {(o.label, FIXTURE_REGEX_0[o.ustart : o.uend]) for o in occs}
    assert ("EMAIL", "test@gmail.com") in got
    assert ("TEL_NO", "+919367788755") in got


def test_nfa_dfa_wikipedia_smoke():
    """tests/finite_automaton.c:25-61 — powerset construction smoke."""
    dfa = compile_regex("(a|b)*abb")
    assert dfa.table.shape[0] >= 3
    assert _matches("(a|b)*abb", "aababb xx") == ["aababb"]


def test_run_to_stuck_semantics():
    """The generated DFA runs to exhaustion with no backtracking to an
    earlier final state (regex_generator.c:1156-1210): 'ab|abc.' on "abcX"
    matches through the longer branch; greedy overrun past a final into a
    dead end FAILS the whole candidate (unlike PCRE)."""
    assert _matches("ab(c.)?", "abcX y") == ["abcX"]
    # greedy overrun: a+ then 'ab' — DFA tracks both, still matches
    assert _matches("a+ab", "aaab") == ["aaab"]
    # stuck in non-final after overrun: a+ requires trailing b, input ends
    # with a run of a's → no backtracking, no match
    assert _matches("a+b", "aaa") == []


def test_closures_and_ranges():
    assert _matches("ab*", "a abb ab") == ["a", "abb", "ab"]
    assert _matches("ab+", "a abb ab") == ["abb", "ab"]
    assert _matches("ab?", "a abb ab") == ["a", "ab", "ab"]
    assert _matches("a{2,3}", "a aa aaa aaaa") == ["aa", "aaa", "aaa"]
    assert _matches("a{2}", "aa") == ["aa"]
    assert _matches("a{2,}", "aaaaa") == ["aaaaa"]


def test_char_classes_and_escapes():
    assert _matches(r"[a-c]+", "abcd") == ["abc"]
    assert _matches(r"[^a-c]+", "abXYc") == ["XY"]
    assert _matches(r"\d+", "ab 123 cd") == ["123"]
    assert _matches(r"\w+", "hi tam_1!") == ["hi", "tam_1"]
    assert _matches(r"\s+", "a \t b") == [" \t "]
    assert _matches(r"a.c", "a\nc abc") == ["abc"]  # '.' excludes newline


def test_anchors():
    assert _matches("^abc", "abc abc") == ["abc"]
    assert _matches("abc$", "abc abc")[-1] == "abc"
    assert len(_matches("abc$", "abc abc")) == 1


def test_alternation():
    assert _matches("cat|dog", "cat dog cow") == ["cat", "dog"]


def test_unicode_multibyte():
    assert _matches("č+", "aa ččč bb") == ["ččč"]


def test_parse_errors():
    with pytest.raises(RegexParseError):
        compile_regex("(abc")
    with pytest.raises(RegexParseError):
        compile_regex("a{2")
    with pytest.raises(RegexParseError):
        compile_regex("[abc")


def test_dfa_is_picklable():
    """DFA tables are broadcast to executors → must pickle."""
    import pickle

    m = DfaMiner("T", r"[0-9]{3}")
    m2 = pickle.loads(pickle.dumps(m))
    assert [o.ustart for o in m2.find("ab 123")] == [3]


def test_quantified_anchor_terminates():
    """ADVICE r1: an EOF pseudo-edge self-loop ('a$*') must not wedge the
    executor; each state's EOF move applies at most once per position."""
    m = DfaMiner("X", "a$*")
    assert [(o.ustart, o.uend) for o in m.find("ba")] == [(1, 2)]
    assert list(m.find("bb")) == []


def test_vectorized_matches_scalar_reference():
    """_match_ends (NumPy batch executor) == _run_to_stuck per position."""
    import random

    import numpy as np

    from nativeextractor_spark.miners.regex_dfa import _match_ends, _run_to_stuck

    rng = random.Random(1234)
    pats = ["ab+c", "(a|b)*c", "x{2,4}", "[a-c]+d?", "a$*", "^ab", "colou?r",
            r"\w+@\w+", "a.c"]
    for pat in pats:
        dfa = compile_regex(pat)
        for _ in range(100):
            t = "".join(rng.choice("abcdx @\n.") for _ in range(rng.randint(0, 50)))
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            ve = _match_ends(dfa, codes)
            for p in range(codes.size):
                se = _run_to_stuck(dfa, codes, p)
                assert ve[p] == (-1 if se is None else se), (pat, t, p)


def test_find_batch_matches_per_doc_find():
    """r8: find_batch runs one _match_ends_multi over the concatenated
    batch — per-doc EOF bounds and BOF pseudo-edges must keep it
    occurrence-identical to solo find(), including across the sub-batch
    flush boundary."""
    import random

    import nativeextractor_spark.miners.regex_dfa as rd

    rng = random.Random(99)
    alphabet = "ab c@0123.-+() \t\nřx$"
    miners = [
        rd.DfaMiner("EMAIL", r"[^@ \t\r\n]+@[^@ \t\r\n]+\.[^@ \t\r\n]+"),
        rd.DfaMiner("TEL", r"[+]?[(]?[0-9]{3}[)]?[-\s.]?[0-9]{3}[-\s.]?[0-9]{4,6}"),
        rd.DfaMiner("EDGE", r"ab*c?"),
    ]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
        for _ in range(300)
    ] + ["", "a@b.cd", "řř +420 123 4567 x"]
    old = rd._BATCH_CHARS
    try:
        rd._BATCH_CHARS = 512  # force several flushes mid-batch
        for m in miners:
            assert m.find_batch(texts) == [list(m.find(t)) for t in texts]
    finally:
        rd._BATCH_CHARS = old
