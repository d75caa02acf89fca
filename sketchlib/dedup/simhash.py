"""SimHash near-duplicate detection (Charikar 2002; Manku et al. WWW'07).

A document's 64-bit SimHash is the sign vector of the sum of its token
hashes' bit patterns (+1 for a set bit, -1 for clear). Hamming-close
simhashes <=> cosine-similar token multisets.

Candidate generation uses the Manku pigeonhole: split 64 bits into
``max_hamming + 1`` chunks — two docs within ``max_hamming`` bit flips MUST
agree on at least one whole chunk (exact recall, no probabilistic miss).
Join on (chunk_id, chunk_value), verify with a popcount of the XOR.

Vectorization: one pandas UDF computes simhashes for a whole Arrow batch —
all tokens of all rows hashed in one Murmur3 call, bit matrix accumulated
with ``np.add.reduceat`` per row. Everything downstream (chunking, join,
popcount) is JVM-side column algebra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..hashing import murmur3_64_flat, to_flat_bytes

_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def simhash_col(text_col: str | Column) -> Column:
    """64-bit SimHash of whitespace tokens (lowercased), as a signed long."""

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        token_lists = [str(t).lower().split() if t is not None else [] for t in texts]
        lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                           count=len(token_lists))
        flat_tokens = [tok.encode("utf-8") for row in token_lists for tok in row]
        flat, offsets = to_flat_bytes(flat_tokens)
        hashes = murmur3_64_flat(flat, offsets)
        # (n_tokens, 64) in {-1, +1}
        bits = ((hashes[:, None] & _BITS[None, :]) != 0).astype(np.int32) * 2 - 1
        bounds = np.zeros(len(token_lists) + 1, dtype=np.int64)
        np.cumsum(lens, out=bounds[1:])
        out = np.zeros(len(token_lists), dtype=np.uint64)
        nonempty = np.nonzero(lens > 0)[0]
        if nonempty.shape[0]:
            sums = np.add.reduceat(bits, bounds[nonempty], axis=0)
            sig = (sums > 0) @ _BITS.astype(np.uint64)
            out[nonempty] = sig
        return pd.Series(out.astype(np.int64))

    return _simhash(F.col(text_col) if isinstance(text_col, str) else text_col)


def _popcount64(col: Column) -> Column:
    """Hamming weight via bin(x).count('1') JVM-side (no UDF)."""
    return F.length(F.regexp_replace(F.bin(col), "0", ""))


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", max_hamming: int = 3,
                           max_bucket: int = 10_000) -> DataFrame:
    """(id_a, id_b, hamming) for all pairs within ``max_hamming`` bits —
    exact (pigeonhole chunking loses no pairs; buckets over ``max_bucket``
    would only arise from degenerate constant columns)."""
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    sim = df.select(F.col(id_col), simhash_col(text_col).alias("simhash"))
    chunks = sim.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
            for i in range(n_chunks)
        ])).alias("chunk_id", "chunk_val"))
    from pyspark.sql import Window

    w = Window.partitionBy("chunk_id", "chunk_val")
    chunks = (chunks.withColumn("__n", F.count("*").over(w))
              .filter(F.col("__n") <= max_bucket).drop("__n"))
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                      "chunk_id", "chunk_val")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                      "chunk_id", "chunk_val")
    pairs = (a.join(b, ["chunk_id", "chunk_val"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sh_a", "sh_b").distinct())
    ham = _popcount64(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return (pairs.select("id_a", "id_b", ham)
            .filter(F.col("hamming") <= max_hamming))
