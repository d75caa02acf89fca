"""Misra–Gries mergeable frequent-items summary: exact-mode parity,
sandwich guarantee under arbitrary merge trees, serde, and the Spark
two-stage aggregation binding."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sketchlib.mg import MisraGriesSketch


def _rand_hashes(n, seed):
    return np.random.default_rng(seed).integers(0, 2**64, size=n, dtype=np.uint64)


def _exact_counts(hashes):
    uniq, cnt = np.unique(hashes, return_counts=True)
    return dict(zip(uniq.tolist(), cnt.astype(np.int64).tolist()))


class TestCore:
    def test_exact_when_k_covers_domain(self):
        """k >= #distinct: no decrement ever happens and every counter is
        the exact frequency."""
        keys = _rand_hashes(20, 1)
        stream = np.repeat(keys, np.arange(1, 21))
        rng = np.random.default_rng(2)
        rng.shuffle(stream)
        sk = MisraGriesSketch(k=32)
        for lo in range(0, len(stream), 37):
            sk.add_hashes(stream[lo:lo + 37])
        assert sk.total_decrement == 0
        assert sk.count_additions == len(stream)
        exact = _exact_counts(stream)
        got = dict(zip(sk.keys.tolist(), sk.counts.tolist()))
        assert got == exact

    def test_sandwich_and_global_bound_small_k(self):
        """est <= true <= est + total_decrement, and total_decrement <=
        n/(k+1), on a Zipf-ish stream squeezed through k=8 counters."""
        rng = np.random.default_rng(3)
        keys = _rand_hashes(200, 4)
        mult = (rng.zipf(1.3, size=200) % 500 + 1).astype(np.int64)
        stream = np.repeat(keys, mult)
        rng.shuffle(stream)
        sk = MisraGriesSketch(k=8)
        sk.add_hashes(stream)
        exact = _exact_counts(stream)
        est = sk.estimate_hashes(keys)
        for key, e in zip(keys.tolist(), est.tolist()):
            assert e <= exact[key]
            assert exact[key] <= e + sk.total_decrement
        assert sk.total_decrement <= len(stream) / (sk.k + 1)

    def test_guaranteed_presence_of_heavy_keys(self):
        """Any key with true frequency > n/(k+1) must be retained."""
        hub = np.uint64(12345)
        tail = _rand_hashes(500, 5)
        stream = np.concatenate([np.repeat(hub, 400), np.repeat(tail, 2)])
        np.random.default_rng(6).shuffle(stream)
        sk = MisraGriesSketch(k=16)
        sk.add_hashes(stream)
        assert len(stream) / (sk.k + 1) < 400
        assert int(sk.estimate_hashes(np.array([hub], dtype=np.uint64))[0]) > 0

    def test_weights(self):
        keys = _rand_hashes(5, 7)
        w = np.array([10, 7, 3, 2, 1], dtype=np.int64)
        sk = MisraGriesSketch(k=8)
        sk.add_hashes(keys, weights=w)
        assert sk.count_additions == 23
        assert sk.estimate_hashes(keys).tolist() == w.tolist()
        with pytest.raises(ValueError):
            sk.add_hashes(keys, weights=-w)

    def test_weights_exact_above_float53(self):
        # float64 bincount would round per-key totals above 2^53 and could
        # OVERcount, violating the certified-lower-bound guarantee;
        # integer accumulation must stay exact
        keys = _rand_hashes(2, 11)
        big = (1 << 53) + 1
        sk = MisraGriesSketch(k=8)
        sk.add_hashes(np.array([keys[0], keys[0], keys[1]]),
                      weights=np.array([big, 1, 5], dtype=np.int64))
        assert sk.estimate_hashes(keys).tolist() == [big + 1, 5]
        assert sk.count_additions == big + 6

    def test_estimate_absent_key_is_zero(self):
        sk = MisraGriesSketch(k=4)
        sk.add_hashes(_rand_hashes(100, 8))
        probe = np.array([1, 2, 3], dtype=np.uint64)
        present = np.isin(probe, sk.keys)
        est = sk.estimate_hashes(probe)
        assert np.all(est[~present] == 0)

    def test_candidates_order(self):
        keys = _rand_hashes(6, 9)
        sk = MisraGriesSketch(k=8)
        sk.add_hashes(np.repeat(keys, [5, 5, 3, 2, 1, 1]))
        ck, cc = sk.candidates()
        assert list(cc) == sorted(cc, reverse=True)
        # count ties break by ascending key
        for i in range(len(cc) - 1):
            if cc[i] == cc[i + 1]:
                assert ck[i] < ck[i + 1]

    def test_merge_k_mismatch_raises(self):
        with pytest.raises(ValueError):
            MisraGriesSketch(k=4).merge(MisraGriesSketch(k=8))

    def test_serde_roundtrip(self):
        sk = MisraGriesSketch(k=8)
        sk.add_hashes(_rand_hashes(1000, 10))
        back = MisraGriesSketch.from_bytes(sk.to_bytes())
        assert back == sk
        empty = MisraGriesSketch(k=8)
        assert MisraGriesSketch.from_bytes(empty.to_bytes()) == empty

    def test_from_bytes_rejects_garbage(self):
        with pytest.raises(ValueError):
            MisraGriesSketch.from_bytes(b"XX" + b"\x00" * 30)
        sk = MisraGriesSketch(k=4)
        sk.add_hashes(_rand_hashes(10, 11))
        with pytest.raises(ValueError):
            MisraGriesSketch.from_bytes(sk.to_bytes()[:-1])


class TestMergeTree:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(0, 30), min_size=1, max_size=300),
           st.integers(2, 12), st.data())
    def test_sandwich_holds_under_any_partitioning(self, items, k, data):
        """Hypothesis: split an arbitrary stream into arbitrary chunks, build
        one sketch per chunk, merge left-to-right — the per-key sandwich and
        the n/(k+1) bound hold (Agarwal et al. 2012 Theorem 2.1)."""
        stream = np.array([hash(("k", v)) & ((1 << 64) - 1) for v in items],
                          dtype=np.uint64)
        n_chunks = data.draw(st.integers(1, min(8, len(items))))
        bounds = sorted(data.draw(
            st.lists(st.integers(0, len(items)), min_size=n_chunks - 1,
                     max_size=n_chunks - 1)))
        parts = np.split(stream, bounds)
        merged = MisraGriesSketch(k=k)
        for part in parts:
            piece = MisraGriesSketch(k=k)
            piece.add_hashes(part)
            merged.merge(piece)
        exact = _exact_counts(stream)
        probe = np.array(list(exact), dtype=np.uint64)
        est = merged.estimate_hashes(probe)
        for key, e in zip(probe.tolist(), est.tolist()):
            assert e <= exact[key]
            assert exact[key] <= e + merged.total_decrement
        assert merged.total_decrement <= len(stream) / (k + 1)
        assert merged.count_additions == len(stream)

    def test_merge_equals_stream_in_exact_mode(self):
        """With k above the domain size both merge orders give the exact
        (hence identical) counter set."""
        a_h, b_h = _rand_hashes(50, 12), _rand_hashes(30, 13)
        both = MisraGriesSketch(k=128)
        both.add_hashes(np.concatenate([a_h, b_h]))
        x, y = MisraGriesSketch(k=128), MisraGriesSketch(k=128)
        x.add_hashes(a_h)
        y.add_hashes(b_h)
        x.merge(y)
        assert x == both


class TestSpark:
    def test_sketch_agg_binding(self, spark):
        """Two-stage aggregation with MgSpec: exact mode (k >= domain) must
        reproduce GROUP BY counts for every key, any partitioning."""
        from pyspark.sql import functions as F

        from sketchlib.spark.aggregate import sketch_agg
        from sketchlib.spark.heavy_hitters import estimate_counts
        from sketchlib.spark.specs import MgSpec

        df = (spark.range(10_000)
              .select((F.col("id") % 97).cast("string").alias("key"))
              .repartition(7))
        spec = MgSpec(k=128)
        [row] = sketch_agg(df, "key", (), spec).collect()
        sk = MisraGriesSketch.from_bytes(bytes(row["sketch"]))
        assert sk.total_decrement == 0
        assert sk.count_additions == 10_000
        keys = df.distinct()
        est = estimate_counts(keys, "key", bytes(row["sketch"]), spec)
        exact = df.groupBy("key").agg(F.count("*").alias("exact_count"))
        bad = (est.join(exact, "key")
               .filter(F.col("est_count") != F.col("exact_count")).count())
        assert bad == 0

    def test_sketch_agg_bounded_k(self, spark):
        """Small k on a skewed column: sandwich bound checked distributedly."""
        from pyspark.sql import functions as F

        from sketchlib.spark.aggregate import sketch_agg
        from sketchlib.spark.heavy_hitters import estimate_counts
        from sketchlib.spark.specs import MgSpec

        df = (spark.range(20_000)
              .select((F.floor(F.sqrt(F.col("id")))).cast("string").alias("key"))
              .repartition(5))
        spec = MgSpec(k=16)
        [row] = sketch_agg(df, "key", (), spec).collect()
        sk = MisraGriesSketch.from_bytes(bytes(row["sketch"]))
        assert 0 < sk.total_decrement <= 20_000 / 17
        est = estimate_counts(df.distinct(), "key", bytes(row["sketch"]), spec)
        exact = df.groupBy("key").agg(F.count("*").alias("exact_count"))
        joined = est.join(exact, "key")
        bad = joined.filter(
            (F.col("est_count") > F.col("exact_count"))
            | (F.col("exact_count") > F.col("est_count") + F.lit(sk.total_decrement))
        ).count()
        assert bad == 0
