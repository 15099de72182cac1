"""Distributed n-gram language-model training and scoring.

The CCNet/Gopher-style quality filter (public method): train word n-gram
counts on a reference corpus, score candidate documents by average negative
log-probability under the model (add-k smoothed), keep the well-scored
tail.  Everything stays JVM-side column algebra:

* n-gram extraction is ``transform(sequence(...))`` over the split word
  array — whole-stage codegen, no Python;
* training is one groupBy count (map-side partial agg);
* scoring joins the document n-grams against the model — BROADCAST when
  the model is dim-sized (vocabulary-bounded), shuffle join otherwise —
  and folds log-probs back per document with one aggregation.

At 10^12 documents the model table is the small side by construction
(n-gram vocabularies saturate); the scan side never materialises per-row
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _words(text_col):
    # lower + whitespace split, dropping empties: the same tokenizer as the
    # engine's shingle/simhash paths (and their SQL mirrors).
    return F.filter(
        F.split(F.lower(text_col), r"\s+"), lambda w: w != F.lit("")
    )


def ngram_column(text_col, n: int):
    """array<string> of word n-grams of ``text_col`` (JVM-side).

    Documents with 0 < words < n contribute their whole word sequence as
    one gram (the engine's short-document shingle rule); empty documents
    contribute none.
    """
    w = _words(text_col)
    full = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.array_join(F.slice(w, i + 1, n), " "),
    )
    short = F.when(F.size(w) > 0, F.array(F.array_join(w, " "))).otherwise(
        F.array().cast("array<string>")
    )
    return F.when(F.size(w) >= n, full).otherwise(short)


def train_ngram_counts(df: DataFrame, n: int = 2, text_col: str = "text",
                       min_count: int = 1) -> DataFrame:
    """(gram, count) model table: one explode + one groupBy count."""
    grams = df.select(F.explode(ngram_column(F.col(text_col), n)).alias("gram"))
    out = grams.groupBy("gram").agg(F.count("*").alias("count"))
    if min_count > 1:
        out = out.where(F.col("count") >= min_count)
    return out


def score_documents(df: DataFrame, model: DataFrame, n: int = 2,
                    text_col: str = "text", id_col: str = "doc_id",
                    add_k: float = 1.0,
                    broadcast_model: bool = True) -> DataFrame:
    """(id, n_grams, avg_logprob) — average add-k-smoothed log-probability
    of each document's n-grams under ``model``.

    logprob(gram) = ln((count + k) / (total + k * vocab)); unseen grams get
    count 0.  Documents with no grams (empty/whitespace text) keep a row
    with ``n_grams = 0`` and NULL ``avg_logprob`` — filter or coalesce at
    the call site.  The per-document fold is sum/count over the exploded
    gram join — associative, so partial aggregation applies.
    """
    totals = model.agg(
        F.sum("count").alias("_total"), F.count("*").alias("_vocab")
    ).collect()[0]
    total, vocab = float(totals["_total"] or 0.0), float(totals["_vocab"] or 0.0)
    denom = total + add_k * max(vocab, 1.0)

    doc_grams = df.select(
        F.col(id_col), F.explode(ngram_column(F.col(text_col), n)).alias("gram")
    )
    m = F.broadcast(model) if broadcast_model else model
    joined = doc_grams.join(m, "gram", "left")
    logprob = F.log((F.coalesce(F.col("count"), F.lit(0)) + F.lit(add_k))
                    / F.lit(denom))
    scored = joined.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.avg(logprob).alias("avg_logprob"),
    )
    # explode drops zero-gram documents; join them back so every input id
    # has an output row (n_grams = 0, NULL score) as documented.
    return (
        df.select(id_col).join(scored, id_col, "left")
        .withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0)))
    )


def quality_filter_by_lm(df: DataFrame, model: DataFrame, n: int = 2,
                         text_col: str = "text", id_col: str = "doc_id",
                         min_avg_logprob: float = -12.0,
                         add_k: float = 1.0) -> DataFrame:
    """Keep documents whose average n-gram log-probability under the
    reference model clears ``min_avg_logprob`` — the standard LM-based
    corpus filter, as one scored semi-join."""
    scored = score_documents(df, model, n=n, text_col=text_col,
                             id_col=id_col, add_k=add_k)
    keep = scored.where(
        F.col("avg_logprob") >= min_avg_logprob
    ).select(id_col)
    # The keep set is corpus-sized (most documents pass a quality filter):
    # a shuffle semi-join on the id, never a broadcast.
    return df.join(keep, id_col, "left_semi")
