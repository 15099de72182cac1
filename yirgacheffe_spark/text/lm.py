"""Distributed n-gram language-model training, scoring, and DSIR selection.

The CCNet/Gopher-style quality filter (public method): train word n-gram
counts on a reference corpus, score candidate documents by average negative
log-probability under the model (add-k smoothed), keep the well-scored
tail.  Plus DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, public method): hashed-n-gram bag models of a TARGET and the
RAW distribution, per-document log importance weight = sum over grams of
``log p_target(bucket) - log p_raw(bucket)``, then deterministic
Gumbel-top-k resampling.  Everything stays JVM-side column algebra:

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

import math

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


# -- DSIR: Data Selection via Importance Resampling ---------------------------
#
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling").  The reference engine has no counterpart (its domain is
# rasters); this is part of the training-data curation layer the graft
# adds on top of the reference's operator set.


def hashed_bucket_column(text_col, n: int, buckets: int):
    """array<bigint> of hashed n-gram feature buckets (JVM-side).

    Bucket = first 15 hex chars of md5(gram) as an integer, mod ``buckets``
    — 60 bits, exact in a signed bigint, and mirrorable in DuckDB as
    ``('0x' || substr(md5(gram), 1, 15))::BIGINT % buckets``.
    """
    return F.transform(
        ngram_column(text_col, n),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
        .cast("bigint") % buckets,
    )


def train_hashed_ngram_model(df: DataFrame, n: int = 2,
                             buckets: int = 10_000,
                             text_col: str = "text") -> DataFrame:
    """(bucket, count) hashed bag-of-n-grams model: one explode + one
    groupBy count.  The model table is <= ``buckets`` rows by construction
    — always broadcastable, regardless of corpus size."""
    b = df.select(
        F.explode(hashed_bucket_column(F.col(text_col), n, buckets))
        .alias("bucket")
    )
    return b.groupBy("bucket").agg(F.count("*").alias("count"))


def dsir_logweights(df: DataFrame, target_model: DataFrame,
                    raw_model: DataFrame, n: int = 2,
                    buckets: int = 10_000, text_col: str = "text",
                    id_col: str = "doc_id",
                    add_k: float = 0.01) -> DataFrame:
    """(id, n_grams, log_weight): per-document DSIR importance weight.

    ``log_weight = sum over grams of log p_target(bucket) - log p_raw
    (bucket)`` with add-k smoothing over the ``buckets``-sized hashed
    vocabulary.  The two models are folded into ONE (bucket, logratio)
    table first (<= ``buckets`` rows) and broadcast, so the corpus side
    pays exactly one explode + one broadcast join + one aggregation —
    no shuffle proportional to gram volume.  Zero-gram documents keep a
    row with ``n_grams = 0`` and ``log_weight`` NULL.
    """
    t_tot = target_model.agg(F.sum("count")).collect()[0][0] or 0
    r_tot = raw_model.agg(F.sum("count")).collect()[0][0] or 0
    t_den = float(t_tot) + add_k * buckets
    r_den = float(r_tot) + add_k * buckets

    ratio = (
        target_model.withColumnRenamed("count", "_tc")
        .join(raw_model.withColumnRenamed("count", "_rc"), "bucket", "full")
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(add_k))
                      / F.lit(t_den))
                - F.log((F.coalesce(F.col("_rc"), F.lit(0)) + F.lit(add_k))
                        / F.lit(r_den))
            ).alias("_logratio"),
        )
    )
    # Unseen-in-both buckets contribute log((k/t_den)/(k/r_den)) — a
    # constant — folded in per-gram at the aggregation via coalesce.
    default = math.log(add_k / t_den) - math.log(add_k / r_den)

    doc_buckets = df.select(
        F.col(id_col),
        F.explode(hashed_bucket_column(F.col(text_col), n, buckets))
        .alias("bucket"),
    )
    joined = doc_buckets.join(F.broadcast(ratio), "bucket", "left")
    scored = joined.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce(F.col("_logratio"), F.lit(default)))
        .alias("log_weight"),
    )
    return (
        df.select(id_col).join(scored, id_col, "left")
        .withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0)))
    )


def dsir_select(df: DataFrame, target_model: DataFrame,
                raw_model: DataFrame, k: int, n: int = 2,
                buckets: int = 10_000, text_col: str = "text",
                id_col: str = "doc_id", add_k: float = 0.01,
                seed: int = 0) -> DataFrame:
    """Select ``k`` documents by Gumbel-top-k importance resampling —
    sampling without replacement proportional to the DSIR importance
    weights, deterministically.

    The Gumbel noise is derived from the CONTENT key: ``u = md5-unit(id,
    seed)`` (the engine's salted-sample hash), ``g = -ln(-ln(u))``, and
    the selection is the top ``k`` of ``log_weight + g`` — so membership
    is invariant under repartitioning, retries, and cluster resizes,
    like every other sampling path in this engine.  Zero-gram documents
    (NULL weight) are never selected.

    Scale: the top-k runs as per-partition partial top-k + one merge
    (Spark's TakeOrderedAndProject), exact at any corpus size but
    k-bounded on the merge side — for billion-row selections use a
    threshold from ``dsir_logweights`` + ``salted_sample``-style
    filtering instead.
    """
    from .sampling import _hash_unit  # pylint: disable=C0415

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = dsir_logweights(df, target_model, raw_model, n=n, buckets=buckets,
                        text_col=text_col, id_col=id_col, add_k=add_k)
    u = _hash_unit(F.col(id_col), seed)
    gumbel = -F.log(-F.log(u))
    keyed = w.where(F.col("log_weight").isNotNull()).select(
        id_col, (F.col("log_weight") + gumbel).alias("_gumbel_key")
    )
    chosen = keyed.orderBy(F.col("_gumbel_key").desc(),
                           F.col(id_col)).limit(k).select(id_col)
    return df.join(chosen, id_col, "left_semi")
