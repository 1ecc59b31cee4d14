"""Result sinks: ngrep-style output formats + table writes.

The reference prints occurrences as plain text, JSON, or CSV
(``print_pos``, ``/root/reference/src/occurrence.c:21-27``; format selection
in ``/root/reference/src/example/ngrep.c:74-89``). Here the formatted record
is produced as a DataFrame column with JVM-side expressions, so a sink is
just ``df.write`` on the formatted column; the canonical durable sink is the
parquet/Iceberg write in :mod:`nativeextractor_spark.io.tables`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIELDS = ["url", "pos", "upos", "len", "ulen", "label", "prob", "str"]


def format_occurrences(occ: DataFrame, fmt: str = "json") -> DataFrame:
    """occurrences → (url, line string) in ngrep's plain/json/csv flavors."""
    if fmt == "json":
        line = F.to_json(F.struct(*[F.col(c) for c in _FIELDS]))
    elif fmt == "csv":
        line = F.concat_ws(
            ",",
            *[
                F.regexp_replace(F.col(c).cast("string"), '"', '""')
                for c in _FIELDS
            ],
        )
    elif fmt == "plain":
        # print_pos shape: "<str>" @ pos=<pos> len=<len> [<label>]
        line = F.format_string(
            '"%s" @ pos=%s len=%s [%s]', "str", "pos", "len", "label"
        )
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return occ.select("url", line.alias("line"))
