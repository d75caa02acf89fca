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

#: fixed random gear table — part of the fingerprint definition.  PINNED
#: as a literal: it was originally drawn from np.random.default_rng(0xCDC),
#: but numpy does not guarantee Generator bit-stream stability across
#: versions, and a silently different table would change every chunk
#: boundary and fingerprint (cross-environment dedup state would stop
#: matching with no error).  These are byte-for-byte the rng(0xCDC) values.
_GEAR = np.frombuffer(bytes.fromhex(
    "5d46417dee6390d8986042fe88cb5f7a922843f6c461f9cf702dabfb9c32e089"
    "ddc860239b60409c0a991d2771f1a2cabb1d8b02069d7a2dc9156d81000b2775"
    "5cc5f413770f5520c6ff0178289be235892674c5fdfdfb802dea5a39c5818518"
    "4fbc7b55adff4ae74491124f3c3d2202adce61230ac84f613ca738b20d86dac1"
    "511663871bfef8deb78a191ac1a0075ad0a4915c91824f2befc302d3a229fd57"
    "28872e9d52828eabe2c189344f4eb68f6a791287a3616aa24d1d9d647af099f3"
    "a1bdaa01bbd654202b469e99e7b60a981b586b6e0912f6f789a2c1ce72ebb78e"
    "e0aa51c611cfbb794bd2714c1fa68635bc97b473f583a357e165236347d08e18"
    "d0c8993a716cbd2f01ded31b49eff8dcef1a80b86b029acdccfcc4c8ac3a9ef5"
    "746a0744e3b4feaa6435e29c847f139d587913ab4bfba8a856993765bff44f53"
    "c661ff25ebe8cd16dc568f1655637e67ce7e3bcb2bb537c4cc3cc787b0fbab9f"
    "ea05198185eda7997103249247e8856ce37b9593b6f45d867f9322452db421da"
    "3090c34b2047db8823e1bd3430c7043adf61d2df932daf7dbd77b1fc5c18fa6b"
    "3a359935c870049efea60143392a9224eebad38554baef51f471f87e97b7f5ee"
    "6298d317615474e99d18774f67964b2e2172af2739081f9288fa5844d97ff0b4"
    "6c68f3512cea52cc714bafe3b31511f29bb4058f12cee0a8937069e602588cc3"
    "cc100124ae51eb77c71d30b3f62f662ad033e1c5dcd5f2cb281661e634ae72e5"
    "e242224177fd64c5a763f5047b04f464e1f9456cf0b707d509b38a22855c0dc2"
    "6134df996730d00deabcd79987a983f760725aa9de0712b2216c7c839a9f8e50"
    "5bc7f22d43ba575bc556d79ea227974446a2be58cd8b0bb1e6f519aaf526458f"
    "13745702a72b1505fcb620d909262b492008a2b1089a38840610c13591e8fce0"
    "02a7c2f594e5d0c687b04ead6261a8b1ebf23cf1c814539599df4d390c43b6b1"
    "da349ac034bed774df3359664d859d15188dbdd95ace97c5777e0ecb4d75bcba"
    "5f47e8ecd0abb813e67b11903423cc984ee3fec7ceebdbdbc830c1ba975a4377"
    "1e5a8cc29743568a318f53316f0c182d1df835ccbf0dbb20abb1a86c0ba56dda"
    "d50a0ff3506df3e9dba32e503d8deb46765c14dc0500bce4de37b9e481f13bde"
    "9558889d5fc11c41ed5f395cf5de5c0d1b012edf54c7041d43b0f6c71fde96a3"
    "aaefb013dce8326c4a08c45960353f5635eb0afe73b9bef3fd2a82f6dde97af0"
    "13ea7f30d6b71fa05793ca7f4d7dc30cdc518f719ca397bf710a09115a511c74"
    "b9e44889868d730a7d502d10a0f7b8efb564661799a8826e49c85bf9421ec2c6"
    "c6dee429f0acbc089c387ffa620437764b74e33f448464f85ec646f197d77b6f"
    "10536a8a8f48bd4956fb1d3f8a22b3fed79737021ed460e72040f1c511462866"
    "b4ff675aae678384c209fa55a96f769dd3ac90934a13450a0d9c030dacc5b070"
    "73b6ff8693c674a7b29f61b9ea5b29deeddfbbbd81b34a41bd6de5cebd4b8f48"
    "7a7f118281ab867f1db659058adf3b3fb60f2587cde0c47362a1fd5819d66ce9"
    "c2175c1f95ca8d52bdd90a2dc6f16bb79921f439c8fceddc323a23134584e402"
    "613a798434ac5e7efd21ceab5f540eb4bb36de705732f3dcfb775df529171001"
    "c6fd04f13dcd2321e5c3eb05b416a169e25a6f9c36368d0d329200ba427aeb83"
    "db8f8ecf2a75e24f43e01ac4024d3301ace981ff86b16d7553827ec5072430d0"
    "358e9b15f14029b2eca2fdd06f4de32f52ebda96a95aaff2b156d0d4b83fd985"
    "24d17aaedded3a2d080065f9fdd85d3a1f643db636d5172425aae44134a42797"
    "9634c35d1ff596f538732c2484a9da8857937cf06aa52308ebd133d054986514"
    "db38f807da0ab139a8ed6059fa87b69f325e4a8dae51f7fbf1ca4ccf542cb6df"
    "cfec54c8452e067e15707fbc36bc29f5171fa3d17aae3f253d4f15d3dd188dd5"
    "eee3f14f79085d5aba14cabac32819a43e3e4773c3ddd244252431807c6fa3b0"
    "1f89cac02a8276efa63410a53d980638fb5a598bb95cd5f6833f82536c2568bb"
    "88400e33253439302147ff6c5e5a93a70a0c47faa0caae84f8171d2000a57168"
    "6822a801d19bfd35c56dbbfc2ea18e35eaa8a6e4a21f20feaf49c1280e40e1db"
    "a3472c157117c28bf16773e077c1f57d9ff8b74e60c25d33c42e97a530baf367"
    "12b35dcf9264a8ecf9fdde1e536fc13592e3058298bf534c86ff61c535a1c386"
    "53442ab17e0730b0b5d692352a576c52f5b7b28490b6934024f63ef6462f8c0e"
    "e76af8384572ecb93aa9cded19c2c8ee3f506197dd60fb40bcafbc48022b6ebe"
    "d5ce2c477813c9086746e4c984a77e289d60e7713c99e85d337129c1bf530366"
    "de43d88ce543c3e1fd5b926d5853a18982012314e2604cc954255fd3d29e5461"
    "1f06115c3ccdf8c0945a75b3237c4750d306cc41458a1ab121ff5b5a3303edb8"
    "fcbc703f6db9b80e54dcc6aca8ae32bb9e1cf14d9dd4ee8880e6b8bdd07b501f"
    "ebf23142dc2d92fd3fe201bb481028663ac0c27e48f8f70ebe7b2f53cbefc4e8"
    "214b51112dca6e1cf3bc250b59ba60b5ebea779dcd1a126f59171ffdebcf55fc"
    "ee19a96a69577b7069c96586b8604c93fc44c17dc33e5c3dc4571cabf53a63c9"
    "ff5a79b7409459db861cfb391a5d2972eb76fbc0d041b0b19a1364602cbf4ac9"
    "7229cbb8993ee07b4e03a39dae819b588820bacf8767ce2c7293ae35b60ecd14"
    "e055a97bd04af13f3c1b609b40296a2536eb13777f9554cb5677f8ec05b77cef"
    "1d279afe06a8ebb27f8cd624d2bd8d2e81d6367a276d6fb20512507450099a7d"
    "e383267d6b293c937c0d0307ae01c8e1918a99d35e9b41e24b1be3bfc7d268b2"), dtype="<u8").astype(np.uint64)


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
