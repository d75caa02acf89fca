"""_PairAccumulator internals under forced compaction and spill — the
memory-bounding path that only triggers past ~8M pending pairs in production
(so Spark-level tests never exercise it)."""

import numpy as np
import pandas as pd

from sketchlib.hll import HllSketch
from sketchlib.spark.aggregate import HllSpec, _PairAccumulator


def _feed(acc, rng, n_batches=10, rows=500, n_groups=7, dup_space=300):
    all_pairs = []
    for _ in range(n_batches):
        codes = rng.integers(0, n_groups, size=rows)
        keys = tuple([np.asarray([f"g{i}" for i in range(n_groups)], dtype=object)])
        hashes = rng.integers(0, dup_space, size=rows).astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15)
        acc.add_batch(codes, keys, hashes)
        all_pairs.extend(zip(codes.tolist(), hashes.tolist()))
    return all_pairs


def _expected_blobs(all_pairs, n_groups=7):
    out = {}
    for g in range(n_groups):
        hs = np.array(sorted({h for c, h in all_pairs if c == g}), dtype=np.uint64)
        adds = sum(1 for c, _ in all_pairs if c == g)
        sk = HllSketch.from_unique_hashes(hs, p=14, count_additions=adds)
        out[f"g{g}"] = sk.to_bytes()
    return out


def test_forced_compaction_matches_unbounded():
    rng = np.random.default_rng(3)
    tight = _PairAccumulator(HllSpec(), compact_threshold=600, spill_threshold=4096)
    pairs = _feed(tight, rng)
    [df] = list(tight.finalize(["g"], "sketch"))
    got = dict(zip(df["g"], df["sketch"]))
    assert got == _expected_blobs(pairs)


def test_forced_spill_matches_unbounded():
    """spill_threshold tiny -> every group goes through the register-sketch
    spill path; blobs must still match the unbounded build (mode transitions
    are order-independent)."""
    rng = np.random.default_rng(4)
    spilly = _PairAccumulator(HllSpec(), compact_threshold=600, spill_threshold=16)
    pairs = _feed(spilly, rng, dup_space=5000)
    [df] = list(spilly.finalize(["g"], "sketch"))
    got = dict(zip(df["g"], df["sketch"]))
    assert got == _expected_blobs(pairs)


def test_spill_bounds_pending_memory():
    rng = np.random.default_rng(5)
    acc = _PairAccumulator(HllSpec(), compact_threshold=400, spill_threshold=32)
    _feed(acc, rng, n_batches=20, rows=400, n_groups=2, dup_space=10_000)
    # after spilling, retained pairs per group never exceed spill_threshold
    assert acc.gcodes.shape[0] <= 2 * 32 + 400  # groups*threshold + last batch


def test_multicolumn_keys_and_empty_batches():
    spec = HllSpec()
    acc = _PairAccumulator(spec, compact_threshold=100)
    k1 = (np.asarray(["a", "b"], dtype=object), np.asarray([1, 2], dtype=np.int64))
    acc.add_batch(np.array([0, 1, 0]), k1, np.array([10, 20, 10], dtype=np.uint64))
    k2 = (np.asarray(["b", "a"], dtype=object), np.asarray([2, 1], dtype=np.int64))
    acc.add_batch(np.array([0, 1]), k2, np.array([30, 11], dtype=np.uint64))
    [df] = list(acc.finalize(["s", "i"], "sketch"))
    rows = {(r.s, r.i): HllSketch.from_bytes(r.sketch) for r in df.itertuples()}
    assert rows[("a", 1)].count() == 2          # hashes {10, 11}
    assert rows[("a", 1)].count_additions == 3  # 10 added twice + 11
    assert rows[("b", 2)].count() == 2          # hashes {20, 30}
