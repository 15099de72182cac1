"""C4-style web-text cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning...", section 2.2) — the other canonical public
pipeline next to Gopher's rules.

Stages (each independently callable; definitions pinned here because the
paper describes rules, not formulas):

* ``c4_line_filter`` — keep only lines that end in terminal punctuation
  (``. ! ? "``), have at least ``min_words`` words (paper: 5 without a
  citation marker... the public C4 code uses 5; configurable), and do not
  contain a blocklisted token (default: ``javascript``, the paper's
  cookie/JS-warning heuristic).  Line order is preserved; pages whose
  every line drops keep an empty string.
* ``c4_page_filter`` — drop pages with fewer than ``min_sentences``
  sentences (default 3), pages containing ``lorem ipsum`` or a curly
  brace ``{`` (the paper's code-page heuristic).
* ``c4_span_dedup`` — the paper's "discard all but one of any
  three-sentence span occurring more than once in the dataset": spans
  are hashed corpus-wide, the FIRST occurrence (smallest
  (doc_id, position)) survives, and every OTHER occurrence has its three
  sentences removed from its page.  Overlapping duplicate spans each mark
  their own sentences; only non-first occurrences delete.

Sentences are split on whitespace following ``. ! ?`` (a deterministic
regex approximation — no NLP model in this environment; the oracle tests
mirror it).  Everything is JVM column algebra; span dedup adds exactly
one shuffle on the 8-byte span hash and one on the page id — the minimal
communication the global rule needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_SENT_SPLIT = r"(?<=[.!?])\s+"
_TERMINAL_RE = r'[.!?"]$'


def _lines(col):
    return F.split(col, "\n")


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   min_words: int = 5,
                   word_blocklist: "tuple[str, ...]" = ("javascript",)) -> DataFrame:
    """Apply the line-level C4 rules (module docstring); rewrites
    ``text_col`` in place, preserving surviving-line order."""
    blocked = [w.lower() for w in word_blocklist]

    def keep(l):
        cond = F.trim(l).rlike(_TERMINAL_RE)
        cond = cond & (
            F.size(F.filter(F.split(F.trim(l), r"\s+"),
                            lambda w: w != F.lit(""))) >= min_words
        )
        for w in blocked:
            cond = cond & ~F.lower(l).contains(w)
        return cond

    kept = F.filter(_lines(F.col(text_col)), keep)
    return df.withColumn(text_col, F.array_join(kept, "\n"))


def c4_page_filter(df: DataFrame, text_col: str = "text",
                   min_sentences: int = 3) -> DataFrame:
    """Apply the page-level C4 rules (module docstring)."""
    col = F.col(text_col)
    n_sent = F.size(
        F.filter(F.split(col, _SENT_SPLIT),
                 lambda s: F.length(F.trim(s)) > 0)
    )
    return df.where(
        (n_sent >= min_sentences)
        & ~F.lower(col).contains("lorem ipsum")
        & ~col.contains("{")
    )


def _sentences(col):
    return F.filter(F.split(col, _SENT_SPLIT),
                    lambda s: F.length(F.trim(s)) > 0)


def c4_span_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", span_sentences: int = 3) -> DataFrame:
    """Corpus-wide duplicate-span removal (module docstring): the first
    occurrence of each ``span_sentences``-sentence span (by (id, position))
    keeps its text; later occurrences lose those sentences.  Pages with
    fewer than ``span_sentences`` sentences pass through untouched.

    Spans are hashed on the lowercased trimmed sentence triple; the global
    first-occurrence rank is ONE window over the 8-byte hash.
    """
    k = span_sentences
    sents = df.select(
        F.col(id_col), _sentences(F.col(text_col)).alias("_s")
    )
    spans = sents.select(
        id_col,
        F.explode(
            F.when(
                F.size("_s") >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size("_s") - k),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("_s", i + 1, k),
                                    lambda s: F.lower(F.trim(s)),
                                ),
                                "",
                            )
                        ).alias("h"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,h:long>>"))
        ).alias("sp"),
    ).select(id_col, F.col("sp.pos").alias("_pos"), F.col("sp.h").alias("_h"))

    w = W.partitionBy("_h").orderBy(F.col(id_col).asc(), F.col("_pos").asc())
    dup_occurrences = (
        spans.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") > 1)
    )
    # Each non-first occurrence deletes its k sentence positions.
    deleted = (
        dup_occurrences.select(
            id_col,
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + (k - 1))
            ).alias("_del"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_del").alias("_dels"))
    )
    # Only documents that actually lose sentences are rebuilt (rebuilding
    # re-joins sentences with single spaces — untouched pages must keep
    # their original bytes).
    rebuilt = (
        sents.join(deleted, id_col, "inner")
        .select(
            id_col,
            F.array_join(
                F.filter(
                    F.transform(
                        "_s",
                        lambda s, i: F.when(
                            F.exists("_dels", lambda d: d == i),
                            F.lit(None).cast("string"),
                        ).otherwise(s),
                    ),
                    lambda s: s.isNotNull(),
                ),
                " ",
            ).alias("_clean"),
        )
    )
    return (
        df.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("_clean"), F.col(text_col)))
        .drop("_clean")
    )
