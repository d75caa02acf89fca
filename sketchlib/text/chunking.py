"""Content-defined chunking (CDC) fingerprints — rolling-hash document
fingerprinting for partial-overlap duplicate detection.

Whole-document fingerprints (``analysis.fingerprint_key``) miss documents
that share most of their content but differ by an insertion: every byte
after the edit shifts, so any fixed-stride fingerprint changes.  CDC cuts
documents at positions determined by a *rolling hash of the local bytes*
(Gear hash: Xia et al., FAST'16 "FastCDC"), so chunk boundaries — and
therefore chunk fingerprints — are stable under insertions/deletions
outside the edited region: two documents sharing a long run of bytes share
its interior chunks no matter where that run sits.

Gear rolling hash: ``h_i = (h_{i-1} << 1) + GEAR[b_i]  (mod 2^64)`` with a
fixed random 256-entry table.  The shift drops one top bit per step, so
``h_i`` depends on exactly the last 64 bytes:

    h_i = sum_{k=0..63} GEAR[b_{i-k}] << k   (mod 2^64)

— a finite shifted convolution, which is how the kernel vectorizes: 64
numpy passes over the whole Arrow text buffer (one per lag), no per-row or
per-byte Python.  A boundary falls after byte i when
``h_i < 2^64 / avg_size`` — a top-bits test (the recurrence concentrates
mixed history in the high bits; low bit k sees only the last k+1 bytes),
expected chunk size ``avg_size``; document ends always close a chunk.  We deliberately skip FastCDC's
min/max-size clamps: they need a sequential greedy scan, and for
*fingerprinting* (not storage dedup) degenerate chunk sizes only shift the
sharing granularity — determinism and edit-locality, the properties that
matter here, are unaffected.  Chunk payloads are hashed with the library's
vectorized Murmur3 straight from the flat buffer.

Scale shape: ``chunk_fingerprints`` is one ``mapInArrow`` pass, zero
shuffle; ``shared_chunk_pairs`` shuffles (chunk_hash, doc) pairs once and
expands candidate pairs inside each chunk bucket with the same
collect-then-expand + ``max_bucket`` explosion guard as the MinHash/SimHash
banding, then counts shared chunks per pair — never all-pairs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..hashing import murmur3_64_flat

#: fixed random gear table — part of the fingerprint definition
_GEAR = np.random.default_rng(0xCDC).integers(
    0, 1 << 64, size=256, dtype=np.uint64)


def _gear_hashes(flat: np.ndarray) -> np.ndarray:
    """Vectorized gear rolling hash of every position of ``flat``:
    out[i] = sum_{k=0..min(i,63)} GEAR[flat[i-k]] << k (mod 2^64) — exactly
    the sequential ``h = (h << 1) + GEAR[b]`` recurrence."""
    g = _GEAR[flat]
    out = g.copy()
    with np.errstate(over="ignore"):
        for k in range(1, 64):
            if k >= flat.shape[0]:
                break
            out[k:] += g[:-k] << np.uint64(k)
    return out


def _doc_chunks(flat: np.ndarray, offsets: np.ndarray,
                threshold: np.uint64) -> tuple[np.ndarray, np.ndarray]:
    """Chunk sub-offsets for every doc in a flat buffer.

    Returns (chunk_offsets, chunks_per_doc): chunk_offsets is a flat int64
    array of chunk boundaries usable with ``murmur3_64_flat``; a doc's
    chunks are contiguous.  Boundaries from the rolling hash are clipped to
    doc edges (the hash window may straddle two docs in the flat buffer for
    the first 63 bytes of a doc — those positions are masked out, so each
    doc's boundaries depend on ITS bytes only)."""
    n_docs = offsets.shape[0] - 1
    if flat.shape[0] == 0:
        return np.zeros(1, dtype=np.int64), np.zeros(n_docs, dtype=np.int64)
    h = _gear_hashes(flat)
    pos = np.arange(flat.shape[0], dtype=np.int64)
    doc_of = np.searchsorted(offsets, pos, side="right") - 1
    doc_start = offsets[doc_of]
    # boundary when the hash lands in the lowest 1/avg_size of u64 space —
    # a top-bits test (the gear recurrence concentrates mixed history in
    # the high bits; the low bit k sees only the last k+1 bytes); and a
    # position's 64-byte window must lie inside its own doc
    valid = h < threshold
    valid &= (pos - doc_start) >= 63
    cut_after = np.nonzero(valid)[0] + 1  # boundary AFTER byte i
    # doc ends always close a chunk; dedupe (a hash cut at a doc end)
    bounds = np.unique(np.concatenate([offsets, cut_after]))
    chunk_doc = np.searchsorted(offsets, bounds[:-1], side="right") - 1
    chunks_per_doc = np.bincount(chunk_doc, minlength=n_docs).astype(np.int64)
    return bounds, chunks_per_doc


def chunk_fingerprints(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       avg_size: int = 256) -> DataFrame:
    """(id, chunks array<bigint>) — Murmur3 fingerprints of each doc's
    content-defined chunks, in order.  NULL/empty text yields an empty
    array.  ``avg_size`` must be a power of two (boundary mask width)."""
    if avg_size < 2 or avg_size & (avg_size - 1):
        raise ValueError(f"avg_size must be a power of two >= 2, got {avg_size}")
    threshold = np.uint64((1 << 64) // avg_size)
    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("chunks", T.ArrayType(T.LongType()), False),
    ])

    def run(batches):
        import pyarrow as pa

        from ..encoding import arrow_flat_bytes

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            txt = batch.column(text_col)
            txt = txt.fill_null("") if txt.null_count else txt
            flat, offsets = arrow_flat_bytes(txt)
            bounds, per_doc = _doc_chunks(flat, np.asarray(offsets), threshold)
            hashes = murmur3_64_flat(flat, bounds).view(np.int64)
            off32 = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(per_doc, out=off32[1:])
            chunks = pa.ListArray.from_arrays(pa.array(off32),
                                              pa.array(hashes))
            yield pa.RecordBatch.from_arrays(
                [batch.column(id_col), chunks],
                schema=pa.schema([batch.schema.field(id_col),
                                  pa.field("chunks", pa.list_(pa.int64()),
                                           nullable=False)]))

    return df.select(id_col, text_col).mapInArrow(run, out_schema)


def shared_chunk_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", avg_size: int = 256,
                       min_shared: int = 2,
                       max_bucket: int = 1000) -> DataFrame:
    """(id_a, id_b, shared_chunks, chunks_a, chunks_b) for pairs sharing at
    least ``min_shared`` distinct chunk fingerprints — partial-overlap
    near-dup detection robust to insertions (unlike whole-doc
    fingerprints).  Chunk buckets larger than ``max_bucket`` are dropped
    whole (boilerplate chunks; the explosion guard of the banding joins)."""
    # fp fans out three ways (sizes feeds two joins, exploded the buckets);
    # unpersisted, the plan re-executes the full-corpus gear-hash+murmur3
    # mapInArrow subtree once per copy — the same pathology minhash and
    # jaccard document and persist against
    from pyspark import StorageLevel
    fp = (chunk_fingerprints(df, text_col, id_col, avg_size)
          .persist(StorageLevel.MEMORY_AND_DISK))
    sizes = fp.select(F.col(id_col),
                      F.size(F.array_distinct("chunks")).alias("__n"))
    exploded = fp.select(
        F.col(id_col), F.explode(F.array_distinct("chunks")).alias("__c"))
    buckets = (exploded.groupBy("__c")
               .agg(F.collect_list(id_col).alias("__ids"))
               .filter((F.size("__ids") >= 2) & (F.size("__ids") <= max_bucket))
               .select(F.array_sort("__ids").alias("__ids")))
    lhs = buckets.select("__ids", F.posexplode("__ids").alias("__i", "id_a"))
    rest = F.slice("__ids", F.col("__i") + 2,
                   F.greatest(F.size("__ids") - F.col("__i") - 1, F.lit(0)))
    pairs = (lhs.select("id_a", F.explode(rest).alias("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("shared_chunks"))
             .filter(F.col("shared_chunks") >= min_shared))
    from ..spark.cacheutil import tag_intermediates
    out = (pairs
           .join(sizes.select(F.col(id_col).alias("id_a"),
                              F.col("__n").alias("chunks_a")), "id_a")
           .join(sizes.select(F.col(id_col).alias("id_b"),
                              F.col("__n").alias("chunks_b")), "id_b")
           .select("id_a", "id_b", "shared_chunks", "chunks_a", "chunks_b"))
    # release with spark.cacheutil.unpersist_intermediates(out) after the
    # terminal action; otherwise repeated calls accumulate cached blocks
    return tag_intermediates(out, fp)
