"""Corpus-wide exact duplicate-SPAN detection and removal.

The ExactSubstr idea from "Deduplicating Training Data Makes Language
Models Better" (Lee et al. 2022): substrings repeated ANYWHERE in the
corpus (across documents or within one) are training-data duplication
even when whole documents differ, and should be removed all-but-once.
Lee et al. build a global suffix array; the Spark-native analogue here
works at token granularity:

1. every ``n_tokens``-gram of every document becomes one occurrence row
   carrying its character interval [s, e) (token start offsets from one
   per-doc running-sum window over the token-length array — the same
   machinery as the span-union Gopher flavor);
2. one CORPUS-WIDE count per gram key finds grams occurring more than
   once; only those (a small fraction of distinct grams) enter the join
   build side, with the gram's global first occurrence
   (min (doc_id, s)) riding along;
3. with ``keep="first"`` (default) every occurrence EXCEPT the global
   first is removal-eligible — the idempotent all-but-one rule (re-running
   on the cleaned corpus removes nothing new); ``keep="none"`` marks every
   occurrence of a duplicated gram;
4. per document, eligible intervals are merged (gaps-and-islands over one
   per-doc window) into maximal duplicate spans — any duplicated
   substring of >= n_tokens tokens is covered, because it contains at
   least one aligned full n-gram that is itself duplicated.

Scale shape: the global count aggregate shuffles 8-byte xxhash64 gram
keys (``gram_key="hash"``, default; ``"string"`` for oracle replay), the
join build side holds duplicated grams only, and everything else is a
per-doc projection/window — no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_ids(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per id: duplicate ids (recrawls) collapse to their min
    text — the deterministic rule curate_corpus uses. Without this, the
    per-doc token-offset arrays below would interleave BOTH copies'
    tokens (corrupted intervals) and the doc-keyed joins would multiply
    rows (r4 review)."""
    return (
        df.select(F.col(id_col), F.col(text_col))
        .groupBy(id_col)
        .agg(F.min(text_col).alias(text_col))
    )


def token_starts(base: DataFrame) -> DataFrame:
    """(doc_id, _starts) from a df carrying (doc_id, _tlens): per-token
    character start offsets via ONE per-doc running-sum window — token i0
    (0-based) starts after all previous token chars plus i0 single-char
    separators. Requires UNIQUE doc_id (see :func:`collapse_ids`).
    Shared by the span operators here and the span-union Gopher flavor
    (textops.lines)."""
    tok = base.select("doc_id", F.posexplode("_tlens").alias("i0", "tl"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i0")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tok.withColumn(
            "s", F.coalesce(F.sum("tl").over(w), F.lit(0)) + F.col("i0")
        )
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("i0", "s")))
            .getField("s")
            .alias("_starts")
        )
    )


def gram_interval_expr(gram_key: str) -> str:
    """SQL array expression producing this row's n-gram occurrence
    structs (gk, s, e) from columns (_toks, _tlens, _starts, n). The
    sequence pads to >=1 entry even when the doc has no n-grams; the pad
    is trimmed by the outer slice but EVALUATED first — the end-token
    index is clamped so element_at stays in bounds (the clamped value
    never survives the slice). Shared with textops.lines."""
    key = (
        "xxhash64(slice(_toks, i, n))"
        if gram_key == "hash"
        else "array_join(slice(_toks, i, n), ' ')"
    )
    return (
        "slice(transform(sequence(1, greatest(size(_toks) - (n - 1), 1)),"
        f" i -> struct({key} AS gk,"
        "             element_at(_starts, i) AS s,"
        "             element_at(_starts, least(i + n - 1, size(_starts)))"
        "               + element_at(_tlens, least(i + n - 1, size(_tlens))) AS e)),"
        " 1, greatest(size(_toks) - (n - 1), 0))"
    )


def _with_token_arrays(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, n_chars, text, _toks, _tlens, _starts): token arrays plus
    per-token character start offsets (split on the single-char class
    ``[ \\n]``). ``df`` must have unique ids (callers collapse first)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).alias("n_chars"),
        text.alias("text"),
        F.split(text, "[ \n]").alias("_toks"),
    ).withColumn("_tlens", F.expr("transform(_toks, t -> length(t))"))
    return base.join(token_starts(base), "doc_id")


def _gram_occurrences(
    base: DataFrame, n_tokens: int, gram_key: str
) -> DataFrame:
    """(doc_id, gk, s, e): one row per n-gram occurrence with its
    character interval."""
    return (
        base.withColumn("n", F.lit(n_tokens))
        .select(
            "doc_id",
            F.explode(F.expr(gram_interval_expr(gram_key))).alias("_g"),
        )
        .select(
            "doc_id",
            F.col("_g.gk").alias("gk"),
            F.col("_g.s").alias("s"),
            F.col("_g.e").alias("e"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens: int = 8,
    keep: str = "first",
    gram_key: str = "hash",
    assume_unique: bool = False,
) -> DataFrame:
    """Per-document maximal duplicate spans: (doc_id, span_s, span_e),
    one row per merged span of removal-eligible duplicated-gram
    occurrences (see module docstring). Documents with no duplicate spans
    emit no rows. Duplicate input ids are collapsed upfront
    (:func:`collapse_ids`); pass ``assume_unique=True`` to skip that
    shuffle when the caller guarantees uniqueness."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if gram_key not in ("hash", "string"):
        raise ValueError(f"gram_key must be 'hash' or 'string', got {gram_key!r}")
    if not assume_unique:
        df = collapse_ids(df, text_col, id_col)
    base = _with_token_arrays(df, text_col, id_col)
    occ = _gram_occurrences(base, n_tokens, gram_key)
    dup = (
        occ.groupBy("gk")
        .agg(
            F.count("*").alias("_c"),
            F.min(F.struct("doc_id", "s")).alias("_first"),
        )
        .where(F.col("_c") > 1)
        .select("gk", "_first")
    )
    eligible = occ.join(dup, "gk")
    if keep == "first":
        eligible = eligible.where(
            ~(
                (F.col("doc_id") == F.col("_first.doc_id"))
                & (F.col("s") == F.col("_first.s"))
            )
        )
    # gaps-and-islands merge per doc: a row starts a new span when its s
    # lies past the running max end of all earlier (by (s, e)) intervals
    w_ord = Window.partitionBy("doc_id").orderBy("s", "e")
    prevmax = F.max("e").over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
    spans = (
        eligible.withColumn(
            "_brk",
            F.when(
                prevmax.isNull() | (F.col("s") > prevmax), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_isl",
            F.sum("_brk").over(
                w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "_isl")
        .agg(F.min("s").alias("span_s"), F.max("e").alias("span_e"))
        .select("doc_id", "span_s", "span_e")
    )
    return spans


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens: int = 8,
    keep: str = "first",
    gram_key: str = "hash",
    assume_unique: bool = False,
) -> DataFrame:
    """(doc_id, n_chars, n_dup_spans, dup_span_chars, dup_span_frac) for
    EVERY input document (zero-valued stats for clean docs). The fraction is
    truncated to 6 decimals with the num*1e6/den association. Duplicate
    input ids are collapsed upfront (see :func:`collapse_ids`)."""
    if not assume_unique:
        df = collapse_ids(df, text_col, id_col)
    spans = duplicate_spans(
        df, text_col, id_col, n_tokens, keep, gram_key, assume_unique=True
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("span_e") - F.col("span_s")).alias("dup_span_chars"),
    )
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("n_chars"),
    )
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("dup_span_chars", F.lit(0))
        .cast("long")
        .alias("dup_span_chars"),
        (
            F.floor(
                F.coalesce("dup_span_chars", F.lit(0))
                * 1000000.0
                / F.greatest("n_chars", F.lit(1))
            )
            / 1000000
        ).alias("dup_span_frac"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens: int = 8,
    keep: str = "first",
    gram_key: str = "hash",
    assume_unique: bool = False,
) -> DataFrame:
    """(doc_id, text, n_removed_chars): documents with their duplicate
    spans spliced out (all-but-first-occurrence, Lee et al. style). The
    splice is a pure-SQL fold over the per-doc sorted merged spans —
    kept text is the concatenation of the complement segments. Idempotent
    under keep="first". Duplicate input ids are collapsed upfront (see
    :func:`collapse_ids`)."""
    if not assume_unique:
        df = collapse_ids(df, text_col, id_col)
    spans = duplicate_spans(
        df, text_col, id_col, n_tokens, keep, gram_key, assume_unique=True
    )
    agg = spans.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("span_s", "span_e"))).alias(
            "_spans"
        )
    )
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_text"),
    )
    # fold: walk the sorted spans, keep [pos, span_s), jump pos to span_e;
    # finish with the tail [pos, end). substring() is 1-based.
    spliced = F.expr(
        "aggregate(_spans,"
        " struct(0L AS pos, '' AS acc),"
        " (a, x) -> struct(x.span_e,"
        "   concat(a.acc, substring(_text, a.pos + 1, x.span_s - a.pos))),"
        " a -> concat(a.acc, substring(_text, a.pos + 1,"
        "   length(_text) - a.pos)))"
    )
    return (
        docs.join(agg, "doc_id", "left")
        .withColumn(
            "text",
            F.when(F.col("_spans").isNull(), F.col("_text")).otherwise(spliced),
        )
        .select(
            "doc_id",
            "text",
            (F.length("_text") - F.length("text")).alias("n_removed_chars"),
        )
    )
