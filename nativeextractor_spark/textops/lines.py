"""Line/n-gram repetition operators for web-corpus curation.

Two classic pre-training cleanup stages, both entirely JVM-side:

- :func:`gopher_repetition` — the repetition rules from Gopher
  (Rae et al. 2021, Table A1): duplicate-line fractions, most-frequent
  n-gram character fractions (n=2..4), duplicated n-gram character
  fractions (n=5..10).
- :func:`drop_duplicate_lines` — C4-style corpus-wide span dedup
  (Raffel et al. 2020 removed all but one occurrence of repeated spans):
  every repeated LINE keeps exactly its first occurrence
  (min (doc_id, position)) across the whole corpus — the standard
  boilerplate-removal pass.

Scale shape: the n-gram stats explode the n VALUES first (9 rows/doc),
then each row's own gram list — bounding per-row memory to one gram
array; line stats and line dedup explode once. Every aggregation is hash
partial-agg; no Python, no windows in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Gopher Table A1 thresholds
_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
_DUP_LINE_FRAC_MAX = 0.30
_DUP_LINE_CHAR_FRAC_MAX = 0.20


def _t6(num, den):
    # floor(num * 1e6 / den): same association as the DuckDB oracles
    return F.floor(num * 1000000.0 / F.greatest(den, F.lit(1))) / 1000000


def gopher_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher repetition metrics + pass flags.

    Definitions (the count-weighted flavor, chosen so an independent SQL
    engine can recompute every value exactly):

    - ``dup_line_frac``: (#line occurrences beyond each line's first) /
      #lines;
    - ``dup_line_char_frac``: characters in those beyond-first line
      occurrences / characters in all lines;
    - ``top{n}gram_char_frac`` (n=2..4): count(top n-gram) * chars(top
      n-gram) / chars(text); the top gram is the (count desc, gram desc)
      maximum — a deterministic tie-break expressible as one
      ``max(struct(count, gram))`` aggregate, no window;
    - ``dup{n}gram_char_frac`` (n=5..10): sum over n-grams with count>1 of
      count * chars(gram) / chars(text). Overlapping occurrences are each
      counted (the span-union flavor some curators use needs per-doc
      interval merging, which would force the pass out of pure SQL; this
      flavor upper-bounds it and uses the same thresholds).

    All fractions are truncated to 6 decimals with the num*1e6/den
    association. Lines explode once; grams explode the n values first,
    then each row's own gram list (see the Scale shape note). Returns one
    row per doc with the metrics, per-rule ``ok_*`` flags, and
    ``repetition_pass``.
    """
    # NULL text is treated as empty (split(NULL) would otherwise emit
    # zero rows and the document would vanish from the output)
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")
    # tokens must not span line breaks; the single-char class keeps the
    # expression reproducible verbatim in the DuckDB oracle
    toks = F.split(text, "[ \n]")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).alias("n_chars"),
        lines.alias("_lines"),
        toks.alias("_toks"),
    )

    # --- line stats: explode, count per (doc, line) -----------------------
    line_rows = base.select(
        "doc_id", "n_chars", F.explode("_lines").alias("line")
    )
    line_stats = (
        line_rows.groupBy("doc_id", "n_chars", "line")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_chars")
        .agg(
            F.sum("c").alias("n_lines"),
            F.sum(F.col("c") - 1).alias("dup_lines"),
            F.sum(F.col("c") * F.length("line")).alias("line_chars"),
            F.sum((F.col("c") - 1) * F.length("line")).alias("dup_line_chars"),
        )
    )

    # --- n-gram stats: explode the n VALUES first (9 rows/doc), then each
    # row builds only ITS n's gram array — peak per-row memory is one gram
    # list instead of all nine stacked (a 9x reduction that keeps wide web
    # pages inside executor heap). slice-to-true-length: a doc with fewer
    # than n tokens has NO n-grams (fraction 0 via the pivot coalesce) —
    # Spark's sequence(1, 0) counts DOWN, so the padded transform is
    # trimmed with an outer slice instead.
    ns = sorted(_TOP_NGRAM_MAX) + sorted(_DUP_NGRAM_MAX)
    gram_rows = (
        base.select(
            "doc_id",
            "n_chars",
            "_toks",
            F.explode(F.array(*[F.lit(n) for n in ns])).alias("n"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n",
            F.explode(
                F.expr(
                    "slice(transform(sequence(1, greatest(size(_toks) - (n - 1), 1)),"
                    " i -> array_join(slice(_toks, i, n), ' ')),"
                    " 1, greatest(size(_toks) - (n - 1), 0))"
                )
            ).alias("gram"),
        )
    )
    gram_counts = gram_rows.groupBy("doc_id", "n_chars", "n", "gram").agg(
        F.count("*").alias("c")
    )
    # top gram per (doc, n): max(struct(count, gram)) — deterministic
    # (count desc, gram desc) pick as a plain aggregate, no window
    per_n = gram_counts.groupBy("doc_id", "n_chars", "n").agg(
        F.max(F.struct(F.col("c"), F.col("gram"))).alias("_top"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("gram")).otherwise(
                F.lit(0)
            )
        ).alias("dup_chars"),
    ).select(
        "doc_id",
        "n_chars",
        "n",
        (F.col("_top.c") * F.length(F.col("_top.gram"))).alias("top_chars"),
        "dup_chars",
    )
    frac = F.when(
        F.col("n").isin(list(_TOP_NGRAM_MAX)),
        _t6(F.col("top_chars"), F.col("n_chars")),
    ).otherwise(_t6(F.col("dup_chars"), F.col("n_chars")))
    gram_wide = (
        per_n.withColumn("_frac", frac)
        .groupBy("doc_id")
        .pivot("n", ns)
        .agg(F.first("_frac"))
    )
    cols = [
        (
            F.coalesce(F.col(str(n)), F.lit(0.0)).alias(
                f"top{n}gram_char_frac"
                if n in _TOP_NGRAM_MAX
                else f"dup{n}gram_char_frac"
            )
        )
        for n in ns
    ]

    out = line_stats.join(gram_wide, "doc_id", "left").select(
        "doc_id",
        _t6(F.col("dup_lines"), F.col("n_lines")).alias("dup_line_frac"),
        _t6(F.col("dup_line_chars"), F.col("line_chars")).alias(
            "dup_line_char_frac"
        ),
        *cols,
    )
    ok_lines = (F.col("dup_line_frac") <= _DUP_LINE_FRAC_MAX) & (
        F.col("dup_line_char_frac") <= _DUP_LINE_CHAR_FRAC_MAX
    )
    ok = ok_lines
    for n, thr in sorted(_TOP_NGRAM_MAX.items()):
        ok = ok & (F.col(f"top{n}gram_char_frac") <= thr)
    for n, thr in sorted(_DUP_NGRAM_MAX.items()):
        ok = ok & (F.col(f"dup{n}gram_char_frac") <= thr)
    return out.withColumn("repetition_pass", ok)


def drop_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 1,
) -> DataFrame:
    """C4-style corpus-wide line dedup: every line occurring more than once
    in the corpus survives ONLY at its first occurrence — min (doc_id,
    position) — all other occurrences are removed; document text is
    reassembled in original line order. Returns (doc_id, text, n_lines,
    n_removed).

    Lines shorter than ``min_line_chars`` (default: empty lines, i.e.
    paragraph separators) are EXEMPT — they always survive. Without the
    exemption a single corpus-global blank line would swallow every other
    document's paragraph structure. Raise the threshold to also exempt
    trivial short lines ("-", "1."). NULL text is treated as empty, so
    every input document keeps an output row.

    Plan: posexplode lines → one groupBy(line) computing (count, first
    occurrence) with map-side partial aggregation → join back on the line
    (broadcast-unfriendly at corpus scale, so it shuffles once on the line
    hash) → filter + re-aggregate per document ordered by position. The
    keeper rule makes the output deterministic and idempotent (running it
    twice removes nothing new).
    """
    rows = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    firsts = rows.groupBy("line").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct("doc_id", "pos")).alias("_first"),
    )
    kept = rows.join(firsts, "line").where(
        (F.length("line") < min_line_chars)
        | (F.col("_cnt") == 1)
        | (
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("pos") == F.col("_first.pos"))
        )
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("pos", "line"))
            ).getField("line"),
            "\n",
        ).alias("text"),
        F.count("*").alias("n_lines"),
    )
    totals = rows.groupBy("doc_id").agg(F.count("*").alias("_total"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            (F.col("_total") - F.coalesce("n_lines", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
