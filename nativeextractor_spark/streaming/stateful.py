"""Custom stateful streaming operator: running entity-mention tallies.

The north-star streaming surface beyond watermarding: arbitrary per-key
state via ``applyInPandasWithState``. This operator keeps, per entity
surface, a running mention count and first-seen processing time across the whole
stream — the streaming analogue of the node table's ``n_mentions`` — and
emits an updated row whenever a key receives new mentions.

State: ``(count long, first_seen_ms long)`` per (label, surface) group.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "label string, surface string, total_mentions long, first_seen_ms long"
STATE_SCHEMA = "count long, first_seen_ms long"


def _update(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    new = sum(len(pdf) for pdf in batches)
    if state.exists:
        count, first_batch = state.get
    else:
        count, first_batch = 0, state.getCurrentProcessingTimeMs()
    count += new
    state.update((count, first_batch))
    label, surface = key
    yield pd.DataFrame(
        {
            "label": [label],
            "surface": [surface],
            "total_mentions": [count],
            "first_seen_ms": [first_batch],
        }
    )


def running_mention_counts(occurrences_stream: DataFrame) -> DataFrame:
    """occurrence stream → stateful running (label, surface) tallies."""
    if not occurrences_stream.isStreaming:
        raise ValueError("running_mention_counts expects a streaming DataFrame")
    return (
        occurrences_stream.select("label", occurrences_stream["str"].alias("surface"))
        .groupBy("label", "surface")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
