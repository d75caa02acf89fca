"""MinHash + LSH near-duplicate detection (word-shingle Jaccard).

Pipeline (Broder 1997 resemblance; Indyk–Motwani LSH banding):

1. **shingles** — distinct word k-grams per doc, built JVM-side
   (``sequence``/``transform``/``array_distinct`` — no Python).
2. **signatures** — one vectorized pandas UDF: Murmur3 each shingle once,
   then n permutations via universal hashing ``(a*h + b) mod p`` evaluated as
   an (n_shingles x n_hashes) numpy min-reduce. Arrow-batched; per-row Python
   never touches a shingle.
3. **banding** — signature split into b bands of r rows; docs sharing any
   band hash become candidates. P(candidate | J=s) = 1-(1-s^r)^b, so with
   r=4, b=32 a pair at s=0.7 is missed with p ~ 1.5e-4.
4. **verify** — candidates join back to shingle arrays; exact Jaccard via
   ``array_intersect``/``array_union`` sizes (JVM-side). Only candidate pairs
   pay the verification cost.

Scale shape: the shuffle keys are (band_id, band_hash) — 16 bytes — and the
self-join explodes only within buckets; a band whose bucket exceeds
``max_bucket`` is dropped as a degenerate cluster guard (standard practice:
an over-full bucket means near-identical boilerplate; pairs inside it are
still found by their other bands with high probability). Deterministic: all
hash seeds are fixed constants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..hashing import murmur3_64_flat, to_flat_bytes

_MERSENNE61 = (1 << 61) - 1


def _perm_params(n_hashes: int, seed: int = 0x5EED) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)  # fixed seed: signatures are normative
    a = rng.integers(1, _MERSENNE61, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE61, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def shingles_col(text_col: Column, k: int = 3) -> Column:
    """Distinct word k-grams (lowercased), JVM-side. Docs with < k tokens get
    their whole token string as the single shingle."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    whole = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(F.when(n >= k, grams).otherwise(whole))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 128,
                       shingle_k: int = 3) -> DataFrame:
    """(id_col, shingles, sig: array<bigint>[n_hashes]) per document."""
    a, b = _perm_params(n_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(shingle_lists: pd.Series) -> pd.Series:
        out = []
        # flatten every row's shingles into one hash batch
        lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64,
                           count=len(shingle_lists))
        flat_vals = [sh.encode("utf-8") for row in shingle_lists for sh in row]
        flat, offsets = to_flat_bytes(flat_vals)
        hashes = murmur3_64_flat(flat, offsets)
        bounds = np.zeros(len(shingle_lists) + 1, dtype=np.int64)
        np.cumsum(lens, out=bounds[1:])
        with np.errstate(over="ignore"):
            for i in range(len(shingle_lists)):
                h = hashes[bounds[i]:bounds[i + 1]]
                if h.shape[0] == 0:
                    out.append(None)
                    continue
                # universal hash into [0, 2^61-1): (a*h + b) mod p, vectorized
                vals = (a[None, :] * h[:, None] + b[None, :]) % np.uint64(_MERSENNE61)
                out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    sh = df.select(F.col(id_col), shingles_col(F.col(text_col), shingle_k).alias("shingles"))
    return sh.withColumn("sig", _sig("shingles"))


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str = "doc_id",
                        bands: int = 32, max_bucket: int = 1000) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing at least one LSH band bucket."""
    n_hashes_col = F.size("sig")
    rows_per_band = (n_hashes_col / bands).cast("int")
    banded = sig_df.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.xxhash64(F.slice("sig", bnd * rows_per_band + 1,
                                               rows_per_band)))
        ).alias("band", "bucket"))
    # degenerate-bucket guard: one window pass (no extra join stage)
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    banded = (banded.withColumn("__n", F.count("*").over(w))
              .filter(F.col("__n") <= max_bucket).drop("__n"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def near_dup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   threshold: float = 0.7, n_hashes: int = 128, bands: int = 32,
                   shingle_k: int = 3) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with exact word-shingle Jaccard >=
    threshold, found via MinHash banding and verified exactly."""
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k).persist()
    pairs = lsh_candidate_pairs(sig, id_col, bands)
    sh = sig.select(F.col(id_col), "shingles")
    j = (pairs
         .join(sh.withColumnRenamed(id_col, "id_a")
                 .withColumnRenamed("shingles", "sh_a"), "id_a")
         .join(sh.withColumnRenamed(id_col, "id_b")
                 .withColumnRenamed("shingles", "sh_b"), "id_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return (j.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
