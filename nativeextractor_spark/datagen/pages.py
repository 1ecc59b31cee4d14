"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Contains, verbatim, the reference fixture documents (urls ``fixture://<name>``,
FIXTURES.md §2) plus seeded synthetic pages with planted entities: emails,
URLs, dates, phone numbers, and alias-dictionary person/org/location names
co-occurring within sentences (feeding the triple stage). A few hot domains
own a disproportionate share of urls to exercise skew handling.

Generation is distributed: ``spark.range(n)`` → ``mapInPandas`` with a
per-row-id seeded RNG, so any scale factor generates without a driver
bottleneck and the content of page *i* is independent of partitioning.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator

import pandas as pd

from nativeextractor_spark.datagen.aliases import alias_rows

FIXTURE_TEXTS: dict[str, str] = {
    "fixture://test.txt": (
        "4444222244442222\n"
        "4444.2222.4444.2222\n"
        "řřřř blah@seznam.com;+čččč\n"
        "\n"
        "a http://www.root.cz?limit=20 xxd\n"
        "\n"
    ),
    "fixture://test_glob_patterns.txt": (
        "abc\ndef\nabcdef\ndomain\n[abcdef][abc-f][a-f]\n???\n*def\n*"
    ),
    "fixture://test_glob.txt": (
        "       abcdef\n  abc    def    \nname@domain.com     \n[-bc\nC:\\Users\\Admin"
    ),
    "fixture://regex_fixture_0.txt": (
        "asds ad +919367788755 asdad\nadsadas test@gmail.com asds sdščččč---"
    ),
    "fixture://null.txt": "",
    "fixture://glob/exact": "abc abcdef abc",
    "fixture://glob/range": "bat cat mat lat",
    "fixture://glob/qmark": "bat mat mad pat lat lot lit",
    "fixture://glob/qmark2": "http://2432.spongedata.cz",
    "fixture://glob/star": (
        "Twinkle twinkle little star I want to hit you with a car "
        "Throw you off a cliff so high Hope you break your neck and die"
    ),
    "fixture://glob/escape": "[abc]de ade bde cde",
    "fixture://glob/escape2": "[",
    "fixture://glob/mixed1": "russel",
    "fixture://glob/mixed2": "awliefduzs78bxc dfueilq234zdhiu 2w45ry7uu7748ju8778",
    "fixture://enclosed/single": "abc def",
    "fixture://enclosed/multi": "abc def ghi jkl",
    "fixture://enclosed/identical": "abc",
}

_FILLER = (
    "the quick brown fox jumps over lazy dog while data flows through wide "
    "tables and narrow pipes under heavy load across many regions with "
    "steady progress during long nights plus careful review before release"
).split()

_HOT_DOMAINS = ["popular.example", "big-news.example", "mega-portal.example"]
_LANGS = ["en", "es", "de", "zh", "cs"]
_BASE_TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_ALIASES = None  # lazily built per process


def _aliases():
    global _ALIASES
    if _ALIASES is None:
        _ALIASES = alias_rows()
    return _ALIASES


def _page_text(rng: random.Random, aliases) -> str:
    sentences = []
    n_sent = rng.randint(3, 9)
    for _ in range(n_sent):
        words = [rng.choice(_FILLER) for _ in range(rng.randint(4, 10))]
        r = rng.random()
        if r < 0.45:  # two co-occurring entity mentions → a triple
            a1 = rng.choice(aliases)[0]
            a2 = rng.choice(aliases)[0]
            k = rng.randint(1, len(words) - 1) if len(words) > 1 else 1
            words.insert(k, a1)
            words.insert(min(k + rng.randint(1, 3), len(words)), a2)
        elif r < 0.60:
            words.insert(
                rng.randint(0, len(words)),
                f"user{rng.randint(0, 9999)}@mail{rng.randint(0, 99)}.example.com",
            )
        elif r < 0.72:
            words.insert(
                rng.randint(0, len(words)),
                f"https://site{rng.randint(0, 999)}.example/path/{rng.randint(0, 99)}",
            )
        elif r < 0.82:
            words.insert(
                rng.randint(0, len(words)),
                f"{rng.randint(1990, 2026)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
            )
        elif r < 0.88:
            words.insert(
                rng.randint(0, len(words)),
                f"+{rng.randint(100, 999)} {rng.randint(100, 999)} {rng.randint(1000, 999999)}",
            )
        sentences.append(" ".join(words) + ".")
    return " ".join(sentences)


def page_rows(ids, seed: int = 42):
    """Deterministic page tuples for the given integer ids."""
    aliases = _aliases()
    out = []
    for i in ids:
        i = int(i)
        rng = random.Random((seed << 32) ^ i)
        if rng.random() < 0.30:  # hot-domain skew
            domain = rng.choice(_HOT_DOMAINS)
        else:
            domain = f"host-{i % 997}.example"
        url = f"https://{domain}/page/{i}"
        text = _page_text(rng, aliases)
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        ts = _BASE_TS + dt.timedelta(seconds=i)
        lang = rng.choice(_LANGS)
        out.append((url, ts, html, text, lang))
    return out


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def generate_pages_df(spark, n_pages: int = 1000, seed: int = 42, include_fixtures: bool = True):
    """Distributed deterministic pages DataFrame (+ verbatim fixture docs)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = page_rows(pdf["id"].tolist(), seed=seed)
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    parallelism = max(spark.sparkContext.defaultParallelism, 1)
    synthetic = (
        spark.range(0, n_pages, numPartitions=min(parallelism, max(1, n_pages // 64) or 1))
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
    if not include_fixtures:
        return synthetic
    fixture_rows = [
        (url, _BASE_TS, b"<html><body>" + t.encode("utf-8") + b"</body></html>", t, "en")
        for url, t in FIXTURE_TEXTS.items()
    ]
    fixtures = spark.createDataFrame(fixture_rows, PAGES_SCHEMA)
    return synthetic.unionByName(fixtures)
