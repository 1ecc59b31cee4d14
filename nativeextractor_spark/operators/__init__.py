from nativeextractor_spark.operators.extract import (
    OCCURRENCE_SCHEMA,
    extract_occurrences,
    scan_document,
    enclosed_keep_mask,
)
from nativeextractor_spark.operators.relational import (
    filter_enclosed_df,
    sort_occurrences_df,
)
from nativeextractor_spark.operators.sinks import format_occurrences

__all__ = [
    "OCCURRENCE_SCHEMA",
    "extract_occurrences",
    "scan_document",
    "enclosed_keep_mask",
    "filter_enclosed_df",
    "sort_occurrences_df",
    "format_occurrences",
]
