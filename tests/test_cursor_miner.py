"""Custom cursor-miner API (the reference's miner.h extension surface)."""

import pickle

from nativeextractor_spark.functions.unicode import is_delimiter
from nativeextractor_spark.miners.cursor import Cursor, CursorMiner, HelloMiner
from nativeextractor_spark.operators import extract_occurrences


def test_hello_miner_tutorial():
    """README.md:261-286 tutorial semantics: literal token match."""
    m = HelloMiner()
    text = "hello world hellos say hello"
    got = [(o.ustart, o.uend) for o in m.find(text)]
    # 'hellos' fails the token-end check
    assert got == [(0, 5), (23, 28)]


def test_custom_digit_run_miner():
    class DigitRun(CursorMiner):
        def matcher(self, c: Cursor) -> bool:
            return (
                c.mark_start()
                and c.match_fn_plus(str.isdigit)
                and c.mark_end()
            )

    got = [
        ("12 a34b 5", o.ustart, o.uend)
        for o in DigitRun("NUM").find("12 a34b 5")
    ]
    assert [(s, e) for _, s, e in got] == [(0, 2), (4, 6), (8, 9)]


def test_combinators():
    c = Cursor("ab12cd", 0, 0)
    assert c.match_string("ab")
    assert c.match_fn_times(str.isdigit, 2)
    assert not c.match_fn_times(str.isdigit, 1)  # resets on fail
    assert c.match_one("xc")
    assert c.match("d")
    assert not c.can_move(1)


def test_cursor_miner_in_spark_kernel(spark):
    pages = spark.createDataFrame(
        [("u1", "say hello now"), ("u2", "hellos")], "url string, text string"
    )
    m = pickle.loads(pickle.dumps(HelloMiner()))  # executors get pickles
    occ = extract_occurrences(pages, [m])
    rows = [(r.url, r.str) for r in occ.collect()]
    assert rows == [("u1", "hello")]
