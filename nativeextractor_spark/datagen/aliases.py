"""Deterministic alias dictionary (gazetteer) generator.

Schema per FIXTURES.md §3: (alias, entity_id, canonical, entity_type).
Surface variants per entity exercise the canonicalization stages:
case variants, diacritics (multi-byte UTF-8), initials, suffix-stripped forms.
Seeded — no external data.
"""

from __future__ import annotations

import random

_FIRST = [
    "John", "Maria", "Antonín", "Petra", "Karel", "Anna", "Tomáš", "Eva",
    "Jan", "Lucie", "Pavel", "Hana", "Jiří", "Alice", "Martin", "Clara",
    "Victor", "Nora", "Samuel", "Ivana",
]
_LAST = [
    "Dvořák", "Novák", "Smith", "Johnson", "Svoboda", "Brown", "Müller",
    "García", "Novotná", "Wilson", "Černý", "Davis", "Horák", "Miller",
    "Kučera", "Taylor", "Procházka", "Anderson", "Veselý", "Thomas",
]
_ORG_A = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Hooli",
    "Vandelay", "Wonka", "Cyberdyne", "Tyrell", "Aperture", "Sponge",
    "Nexus", "Quantum", "Vertex", "Orbit", "Zenith", "Pioneer", "Atlas",
]
_ORG_B = ["Corp", "Industries", "Labs", "Systems", "Data", "Group", "Works"]
_LOC = [
    "Prague", "Brno", "Vienna", "Berlin", "London", "Paris", "Madrid",
    "Oslo", "Praha", "Ostrava", "Plzeň", "Dresden", "Linz", "Geneva",
    "Kraków", "Bratislava", "Budapest", "Zurich", "Milan", "Porto",
]


def _strip_diacritics(s: str) -> str:
    import unicodedata

    return "".join(
        c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn"
    )


def alias_rows(n_entities: int = 600, seed: int = 42) -> list[tuple[str, int, str, str]]:
    """Returns (alias, entity_id, canonical, entity_type) rows, ~2k aliases."""
    rng = random.Random(seed)
    rows: list[tuple[str, int, str, str]] = []
    seen: set[str] = set()

    def add(alias: str, eid: int, canonical: str, etype: str):
        if alias and alias not in seen:
            seen.add(alias)
            rows.append((alias, eid, canonical, etype))

    eid = 0
    for _ in range(n_entities):
        etype = rng.choice(["PER", "PER", "ORG", "LOC"])
        if etype == "PER":
            first, last = rng.choice(_FIRST), rng.choice(_LAST)
            canonical = f"{first} {last}"
            add(canonical, eid, canonical, etype)
            add(f"{first[0]}. {last}", eid, canonical, etype)
            add(canonical.lower(), eid, canonical, etype)
            stripped = _strip_diacritics(canonical)
            if stripped != canonical:
                add(stripped, eid, canonical, etype)
        elif etype == "ORG":
            a, b = rng.choice(_ORG_A), rng.choice(_ORG_B)
            canonical = f"{a} {b}"
            add(canonical, eid, canonical, etype)
            add(a, eid, canonical, etype)
            add(f"{a} {b} Inc".replace(" Inc Inc", " Inc"), eid, canonical, etype)
            add(canonical.upper(), eid, canonical, etype)
        else:
            canonical = rng.choice(_LOC)
            add(canonical, eid, canonical, etype)
            add(canonical.lower(), eid, canonical, etype)
            stripped = _strip_diacritics(canonical)
            if stripped != canonical:
                add(stripped, eid, canonical, etype)
        eid += 1
    return rows


def build_alias_df(spark, n_entities: int = 600, seed: int = 42):
    return spark.createDataFrame(
        alias_rows(n_entities, seed),
        "alias string, entity_id long, canonical string, entity_type string",
    )
