"""Content-defined chunking fingerprints (sketchlib.text.chunking)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.text.chunking import (_GEAR, _doc_chunks, chunk_fingerprints,
                                     shared_chunk_pairs)


def _naive_boundaries(data: bytes, threshold: int) -> list[int]:
    """Reference implementation: the sequential gear recurrence."""
    h, cuts = 0, []
    for i, b in enumerate(data):
        h = ((h << 1) + int(_GEAR[b])) & ((1 << 64) - 1)
        if i >= 63 and h < threshold:
            cuts.append(i + 1)
    return cuts


def test_vectorized_matches_sequential_recurrence():
    rng = np.random.default_rng(5)
    docs = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
            for n in (0, 10, 63, 64, 200, 1000, 4096)]
    flat = np.frombuffer(b"".join(docs), dtype=np.uint8)
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    thr = np.uint64((1 << 64) // 64)  # avg 64-byte chunks
    bounds, per_doc = _doc_chunks(flat, offsets, thr)
    # reconstruct per-doc boundaries from the flat output
    got = []
    k = 0
    for i, d in enumerate(docs):
        doc_bounds = bounds[k:k + per_doc[i] + 1] - offsets[i] \
            if per_doc[i] else np.array([0, 0])
        k += per_doc[i]
        got.append([int(b) for b in doc_bounds[1:-1]])  # interior cuts only
    for d, interior in zip(docs, got):
        assert interior == _naive_boundaries(d, (1 << 64) // 64), len(d)


def test_fingerprints_partition_independent(spark):
    rng = np.random.default_rng(9)
    rows = [(i, "".join(chr(97 + c) for c in
                        rng.integers(0, 26, 500))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["chunks"] for r in
         chunk_fingerprints(df, avg_size=64).collect()}
    b = {r["doc_id"]: r["chunks"] for r in
         chunk_fingerprints(df.repartition(7), avg_size=64).collect()}
    assert a == b
    assert all(len(v) >= 1 for v in a.values())


def test_edit_locality_and_shared_pairs(spark):
    rng = np.random.default_rng(3)
    base = "".join(chr(97 + c) for c in rng.integers(0, 26, 2000))
    edited = base[:1000] + " SOMETHING INSERTED HERE " + base[1000:]
    unrelated = "".join(chr(97 + c) for c in rng.integers(0, 26, 2000))
    df = spark.createDataFrame(
        [(0, base), (1, edited), (2, unrelated), (3, base)],
        "doc_id long, text string")
    fp = {r["doc_id"]: set(r["chunks"]) for r in
          chunk_fingerprints(df, avg_size=64).collect()}
    # exact dup shares everything
    assert fp[0] == fp[3]
    # insertion preserves most chunks (edit locality)
    overlap = len(fp[0] & fp[1]) / len(fp[0])
    assert overlap > 0.7, overlap
    # unrelated text shares (essentially) nothing
    assert len(fp[0] & fp[2]) <= 1
    res = shared_chunk_pairs(df, avg_size=64, min_shared=2)
    pairs = {(r["id_a"], r["id_b"]): r["shared_chunks"] for r in
             res.collect()}
    assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs
    assert not any({a, b} == {0, 2} for a, b in pairs)
    # the persisted fingerprint intermediate is tagged onto the result and
    # releasable — repeated calls must not leak cached blocks for the
    # session lifetime
    from sketchlib.spark.cacheutil import unpersist_intermediates
    assert unpersist_intermediates(res) == 1
    assert unpersist_intermediates(res) == 0  # idempotent
    assert unpersist_intermediates(df) == 0   # safe on untagged frames


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(0, ""), (1, None), (2, "short")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["chunks"] for r in
           chunk_fingerprints(df, avg_size=64).collect()}
    assert got[0] == [] and got[1] == []
    assert len(got[2]) == 1  # sub-64-byte doc -> one whole-doc chunk


def test_avg_size_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_fingerprints(df, avg_size=100)
