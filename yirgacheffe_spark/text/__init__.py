"""Training-data pipeline operators.

Modules (each importable directly; nothing heavy imports at package load):

* ``dedup`` — exact, MinHash+LSH (batch, fused, incremental-vs-index),
  SimHash, n-gram Jaccard verify, connected-components clustering,
  line-level boilerplate removal;
* ``quality`` — token/char counts, quality score, fingerprint, language
  id, PII redaction/auditing;
* ``ann`` — brute-force / LSH / IVF cosine top-k and near-dup pairs;
* ``sampling`` — deterministic content-keyed sampling, train/test and
  leakage-safe splits, fixed-token-budget sequence packing;
* ``lm`` — n-gram LM training, scoring, and LM-based quality filtering;
* ``multimodal`` — binary media columns (decode honestly stubbed);
* ``pipeline`` — ``curate_corpus``, the one-call composition.
"""

from . import ann, dedup, lm, multimodal, pipeline, quality, sampling
from .pipeline import curate_corpus

__all__ = ["ann", "dedup", "lm", "multimodal", "pipeline", "quality",
           "sampling", "curate_corpus"]
