"""DataFrame-level equivalents of the post-processing operators.

The canonical path runs these in-kernel (per document, zero shuffle —
:mod:`nativeextractor_spark.operators.extract`); the DataFrame forms below
exist for (a) SQL-oracle checkability and (b) filtering occurrence tables
that were materialized without in-kernel filtering.

Reference semantics:
- enclosed filter: ``/root/reference/src/extractor.c:145-203``
- sort: (pos asc, len asc), ``/root/reference/src/extractor.c:102-123``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_enclosed_df(occ: DataFrame, key_col: str = "url") -> DataFrame:
    """E_NO_ENCLOSED_OCCURRENCES over an occurrences DataFrame.

    Window formulation (no self-join): order spans by (pos asc, end desc);
    a span is dominated iff the max end over strictly-earlier-pos spans
    reaches its end, or an equal-pos span has strictly larger end. Identical
    spans (same pos+len, different labels) share their fate and are kept
    (extractor.c:166-169). One shuffle on ``key_col`` — at scale, prefer the
    in-kernel filter which needs none.
    """
    end = F.col("pos") + F.col("len")
    w_prev_pos = (
        Window.partitionBy(key_col)
        .orderBy("pos")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same_pos = Window.partitionBy(key_col, "pos")
    with_end = occ.withColumn("_end", end)
    dominated = (
        F.coalesce(F.max("_end").over(w_prev_pos), F.lit(-1)) >= F.col("_end")
    ) | (F.max("_end").over(w_same_pos) > F.col("_end"))
    return with_end.withColumn("_dom", dominated).filter(~F.col("_dom")).drop(
        "_end", "_dom"
    )


def sort_occurrences_df(occ: DataFrame, key_col: str = "url") -> DataFrame:
    """E_SORT_RESULTS as an explicit rank column (order survives comparison)."""
    w = Window.partitionBy(key_col).orderBy("pos", "len", "label")
    return occ.withColumn("rank", F.row_number().over(w))
