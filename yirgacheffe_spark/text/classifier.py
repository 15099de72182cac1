"""Model-based quality classification (fastText/CCNet/FineWeb-style).

The public method behind CCNet's fastText filter and FineWeb-Edu's
classifier stage: train a linear classifier over hashed bag-of-n-gram
features on a labeled seed set (high-quality reference pages = 1, random
crawl pages = 0), then score the full corpus and keep documents above a
probability threshold.  The reference engine has no counterpart (its
domain is rasters); this belongs to the curation layer the graft adds.

Spark-first: the whole path is a ``pyspark.ml`` Pipeline —
``RegexTokenizer`` -> ``NGram`` union -> ``HashingTF`` (murmur3, JVM) ->
``LogisticRegression`` — so both training (distributed L-BFGS over
treeAggregate gradients) and scoring (one JVM map stage, no Python
workers, no shuffle) scale with the cluster.  At 10^12 documents the
model is a fixed ``num_features``-sized coefficient vector broadcast
with the task closure; scoring adds zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_FEATURES_COL = "_yg_features"
_WORDS_COL = "_yg_words"
_BIGRAMS_COL = "_yg_bigrams"
_ALLGRAMS_COL = "_yg_allgrams"


_TEXT_COL = "_yg_text"
_RAW_COL = "_yg_raw_pred"
_PROB_COL = "_yg_prob"
_PRED_COL = "_yg_pred"


def _feature_stages(text_col: str, num_features: int):
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, SQLTransformer

    return [
        # NULL text must score, not NPE the tokenizer (crawl tables carry
        # nulls); a null doc scores as an empty feature vector.
        SQLTransformer(statement=(
            f"SELECT *, coalesce({text_col}, '') AS {_TEXT_COL} FROM __THIS__"
        )),
        RegexTokenizer(inputCol=_TEXT_COL, outputCol=_WORDS_COL,
                       pattern=r"\s+", toLowercase=True),
        NGram(n=2, inputCol=_WORDS_COL, outputCol=_BIGRAMS_COL),
        SQLTransformer(statement=(
            f"SELECT *, concat({_WORDS_COL}, {_BIGRAMS_COL}) "
            f"AS {_ALLGRAMS_COL} FROM __THIS__"
        )),
        HashingTF(inputCol=_ALLGRAMS_COL, outputCol=_FEATURES_COL,
                  numFeatures=num_features),
    ]


def train_quality_classifier(labeled: DataFrame, text_col: str = "text",
                             label_col: str = "label",
                             num_features: int = 1 << 18,
                             reg_param: float = 1e-4,
                             max_iter: int = 50):
    """Fit the tokenize->hash->logistic pipeline on a labeled seed set.

    ``labeled`` needs ``text_col`` and a 0/1 ``label_col``.  Returns a
    fitted ``PipelineModel``; persist with ``model.write().save(path)``
    and reload with ``PipelineModel.load`` — the standard ml artifact
    flow, so one training run serves every later scoring job.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    # _yg_-prefixed output columns: the defaults (prediction/probability/
    # rawPrediction) would collide with same-named user columns and break
    # the schema-preservation contract of score_quality.
    lr = LogisticRegression(
        featuresCol=_FEATURES_COL, labelCol=label_col,
        rawPredictionCol=_RAW_COL, probabilityCol=_PROB_COL,
        predictionCol=_PRED_COL,
        regParam=reg_param, maxIter=max_iter,
    )
    return Pipeline(stages=_feature_stages(text_col, num_features) + [lr]).fit(
        labeled.withColumn(label_col, F.col(label_col).cast("double"))
    )


def score_quality(df: DataFrame, model, prob_col: str = "quality_prob") -> DataFrame:
    """``df`` + ``prob_col`` = P(label=1): one JVM map stage, no shuffle.

    Intermediate pipeline columns are dropped; the input schema is
    preserved plus the probability.
    """
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    drop = [_TEXT_COL, _WORDS_COL, _BIGRAMS_COL, _ALLGRAMS_COL,
            _FEATURES_COL, _RAW_COL, _PROB_COL, _PRED_COL]
    return scored.withColumn(
        prob_col, vector_to_array(F.col(_PROB_COL)).getItem(1)
    ).drop(*drop)


def quality_classifier_filter(df: DataFrame, model,
                              threshold: float = 0.5) -> DataFrame:
    """Keep documents the classifier scores above ``threshold`` — the
    CCNet/FineWeb keep-the-head filter, input schema preserved."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    prob = "_yg_quality_prob"
    return score_quality(df, model, prob_col=prob).where(
        F.col(prob) >= threshold
    ).drop(prob)
