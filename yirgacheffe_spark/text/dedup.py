"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for scale:

* exact dedup is one hash-groupBy (map-side combine, one shuffle);
* MinHash signatures are computed in one Arrow-vectorised pass, candidates
  come from a *band-bucket self-join* (shuffle keyed on (band, bucket) — hot
  buckets are bounded by banding), and only candidates are verified;
* SimHash near-dup uses the same banding trick over bit-chunks;
* n-gram Jaccard is the exact verifier, shingle-set based, vectorised.

Nothing here collects the corpus to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (lowest id) per identical text."""
    key = F.md5(F.col(text_col))
    return (
        df.withColumn("_k", key)
        .withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("_k").orderBy(F.col(id_col).asc())
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_k", "_rn")
    )


def _shingles(text: str, n: int) -> set:
    words = text.lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _hash64(values: list[str]) -> np.ndarray:
    return pd.util.hash_pandas_object(
        pd.Series(values, dtype=object), index=False,
        hash_key="yirgacheffespark", categorize=False,
    ).to_numpy(dtype=np.uint64)


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_n: int = 3, seed: int = 42) -> DataFrame:
    """(id, sig: array<long>) — universal-hash MinHash over word shingles,
    one vectorised pass per batch."""
    a_params, b_params = _minhash_params(num_perm, seed)

    @pandas_udf("array<long>")
    def signature(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = sorted(_shingles(t or "", shingle_n))
            if not sh:
                out.append([0] * num_perm)
                continue
            h = _hash64(sh) % np.uint64(_MERSENNE)
            # (a*h + b) mod p for all perms x shingles, min over shingles.
            with np.errstate(over="ignore"):
                m = (a_params[:, None] * h[None, :] + b_params[:, None]) % np.uint64(_MERSENNE)
            out.append(m.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), signature(F.col(text_col)).alias("sig"))


def minhash_lsh_candidates(sigs: DataFrame, id_col: str = "doc_id",
                           bands: int = 8) -> DataFrame:
    """Candidate near-dup pairs: ids sharing any LSH band bucket.

    One explode + one self-join keyed on (band, bucket hash); output is the
    deduplicated (id_a < id_b) pair set.
    """
    num_perm = None  # derived per-row from the array
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        b * (F.size("sig") / bands).cast("int") + 1,
                        (F.size("sig") / bands).cast("int"),
                    ).cast("string")
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.withColumnRenamed(id_col, "id_a")
    right = banded.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, ["band", "bucket"], "inner")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shingle_n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for given candidate pairs (the verifier)."""
    docs_a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    docs_b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    joined = pairs.join(docs_a, "id_a").join(docs_b, "id_b")

    @pandas_udf("double")
    def jaccard(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            sa, sb = _shingles(x or "", shingle_n), _shingles(y or "", shingle_n)
            union = len(sa | sb)
            out[i] = (len(sa & sb) / union) if union else 1.0
        return pd.Series(out)

    return joined.select("id_a", "id_b", jaccard("text_a", "text_b").alias("jaccard"))


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 64, bands: int = 8, shingle_n: int = 3,
                        threshold: float = 0.7) -> DataFrame:
    """End-to-end near-dup pair detection: sign -> band-join -> verify."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    cands = minhash_lsh_candidates(sigs, id_col, bands)
    verified = jaccard_pairs(df, cands, text_col, id_col, shingle_n)
    return verified.where(F.col("jaccard") >= threshold)


# -- SimHash ------------------------------------------------------------------

def simhash_column(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over word hashes."""

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = (t or "").lower().split()
            if not words:
                out[i] = 0
                continue
            h = _hash64(words)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            out[i] = int(
                np.int64(
                    np.bitwise_or.reduce(
                        (vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
                    ).astype(np.int64)
                )
            )
        return pd.Series(out)

    return df.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash"))


def simhash_near_dups(hashes: DataFrame, id_col: str = "doc_id",
                      max_hamming: int = 3, chunks: int = 8) -> DataFrame:
    """Near-dup pairs by Hamming distance: pigeonhole banding then exact
    popcount verification.

    Completeness requires ``chunks > max_hamming`` (a pair differing in at
    most ``max_hamming`` bits cannot touch all chunks, so it must agree on
    at least one bucket); callers wanting a looser threshold trade recall.
    """
    if chunks <= max_hamming:
        raise ValueError(
            f"chunks ({chunks}) must exceed max_hamming ({max_hamming}) "
            "for the banding to be complete"
        )
    width = 64 // chunks
    # Chunk extraction unrolled driver-side (chunk count is a plan constant,
    # so each shift amount is a literal the JVM can codegen).
    chunk_exprs = [
        F.shiftrightunsigned(F.col("simhash"), c * width).bitwiseAND(F.lit((1 << width) - 1))
        for c in range(chunks)
    ]
    banded = hashes.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(F.array(*chunk_exprs)).alias("chunk_idx", "chunk_val"),
    )
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "chunk_idx", "chunk_val"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "chunk_idx", "chunk_val"
    )
    cands = (
        left.join(right, ["chunk_idx", "chunk_val"], "inner")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cands.withColumn("hamming", hamming).where(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
