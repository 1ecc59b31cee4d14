"""Property test: the O(n log n) enclosed-span mask vs the reference's O(n²)
pairwise algorithm (filter_longest_occurrences, extractor.c:145-203)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from nativeextractor_spark.operators import enclosed_keep_mask


def _reference_filter(spans):
    """Direct transcription of the pairwise marking loop."""
    labels = [object() for _ in spans]  # distinct labels: identical spans kept
    alive = [True] * len(spans)
    for i in range(len(spans)):
        for j in range(i + 1, len(spans)):
            if not alive[i]:
                break
            if not alive[j]:
                continue
            (ap, al), (bp, bl) = spans[i], spans[j]
            aend, bend = ap + al, bp + bl
            if ap == bp and al == bl:
                continue  # identical spans with different labels are kept
            if ap <= bp and bend <= aend:
                alive[j] = False
            if bp <= ap and aend <= bend:
                alive[i] = False
    return alive


@settings(max_examples=300, deadline=None)
@given(
    spans=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 15)),
        min_size=0,
        max_size=24,
    )
)
def test_keep_mask_matches_pairwise_reference(spans):
    pos = np.array([p for p, _ in spans], dtype=np.int64)
    end = np.array([p + l for p, l in spans], dtype=np.int64)
    got = list(enclosed_keep_mask(pos, end))
    expected = _reference_filter(spans)
    assert got == expected, spans
