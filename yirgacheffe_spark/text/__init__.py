"""Training-data pipeline operators.

Submodules (loaded LAZILY — importing this package stays light; numpy /
pandas / pyspark only load when a submodule is first touched):

* ``dedup`` — exact, MinHash+LSH (batch, fused, incremental-vs-index),
  SimHash, n-gram Jaccard verify, connected-components clustering,
  line-level boilerplate removal;
* ``quality`` — token/char counts, quality score, fingerprint, language
  id, PII redaction/auditing;
* ``ann`` — brute-force / LSH / IVF cosine top-k and near-dup pairs;
* ``bloom`` — distributed Bloom-filter build/probe + index-backed exact
  dedup pre-filtering (no-false-negative routing, exact results);
* ``classifier`` — fastText-style hashed-n-gram logistic quality
  classifier (pyspark.ml pipeline: train / score / filter);
* ``sampling`` — deterministic content-keyed sampling, token-budget and
  domain-mixture sampling, train/test and
  leakage-safe splits, fixed-token-budget sequence packing;
* ``lm`` — n-gram LM training, scoring, LM-based quality filtering, and
  DSIR importance resampling (hashed-n-gram weights + Gumbel-top-k);
* ``multimodal`` — binary media columns (decode honestly stubbed);
* ``gopher`` — Gopher (Rae et al. 2021) quality signals + rule filter;
* ``c4`` — C4 (Raffel et al. 2020) line/page rules + global
  three-sentence-span dedup;
* ``urls`` — URL canonicalization, canonical dedup, domain filtering,
  per-domain caps;
* ``pipeline`` — ``curate_corpus``, the one-call composition.
"""

import importlib

_SUBMODULES = ("ann", "bloom", "c4", "classifier", "dedup", "gopher", "lm",
               "multimodal", "pipeline", "quality", "sampling", "urls")

__all__ = list(_SUBMODULES) + ["curate_corpus"]


def __getattr__(name):
    if name in _SUBMODULES:
        module = importlib.import_module("." + name, __name__)
        globals()[name] = module
        return module
    if name == "curate_corpus":
        from .pipeline import curate_corpus  # pylint: disable=C0415

        globals()[name] = curate_corpus
        return curate_corpus
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
