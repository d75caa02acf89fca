"""AMS F2 sketch, CMS join-size inner product, table profiler, and
theta-containment join discovery."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.ams import AmsSketch
from sketchlib.cms import CountMinSketch
from sketchlib.theta import ThetaSketch


def _rand_hashes(n, seed):
    return np.random.default_rng(seed).integers(0, 2**64, size=n, dtype=np.uint64)


class TestAmsSketch:
    def test_exact_f2_on_small_streams(self):
        """Brute-force parity: F2 of a stream with known per-key counts.
        With w=4096 and only a handful of distinct keys, collisions are
        absent and every row estimate is exact."""
        keys = _rand_hashes(5, 1)
        counts = np.array([10, 7, 3, 2, 1], dtype=np.int64)
        sk = AmsSketch(width=1 << 12, depth=7)
        sk.add_hashes(keys, counts)
        assert sk.estimate_f2() == int((counts.astype(object) ** 2).sum())
        assert sk.count_additions == int(counts.sum())

    def test_merge_is_stream_concat_and_order_invariant(self):
        """Linear sketch: sketch(A) + sketch(B) == sketch(A ++ B) bit-for-bit,
        in any merge order."""
        a_h, b_h = _rand_hashes(500, 2), _rand_hashes(300, 3)
        both = AmsSketch()
        both.add_hashes(np.concatenate([a_h, b_h]))
        a1, b1 = AmsSketch(), AmsSketch()
        a1.add_hashes(a_h)
        b1.add_hashes(b_h)
        a1.merge(b1)
        assert a1 == both
        a2, b2 = AmsSketch(), AmsSketch()
        a2.add_hashes(a_h)
        b2.add_hashes(b_h)
        b2.merge(a2)
        assert b2 == both

    def test_serde_roundtrip(self):
        sk = AmsSketch(width=1 << 8, depth=5)
        sk.add_hashes(_rand_hashes(1000, 4))
        assert AmsSketch.from_bytes(sk.to_bytes()) == sk

    def test_accuracy_within_published_bound(self):
        """Zipf-ish stream: median-of-rows within 6.8 row-standard-errors
        (sqrt(2/w)) of exact F2 across seeds."""
        rng = np.random.default_rng(5)
        for seed in range(5):
            n_keys = 2000
            counts = (rng.zipf(1.5, size=n_keys) % 1000 + 1).astype(np.int64)
            keys = _rand_hashes(n_keys, 100 + seed)
            exact = int((counts.astype(object) ** 2).sum())
            sk = AmsSketch(width=1 << 12, depth=7)
            sk.add_hashes(keys, counts)
            margin = 6.8 * (2.0 / sk.width) ** 0.5
            assert abs(sk.estimate_f2() - exact) <= margin * exact, seed

    def test_point_queries_exact_when_collision_free(self):
        """CountSketch point queries (Charikar et al. 2002 §3): with a
        handful of keys in a wide sketch, no column collides in the median
        row, so every estimate is exactly the true count."""
        keys = _rand_hashes(8, 11)
        counts = np.array([100, 50, 25, 12, 6, 3, 2, 1], dtype=np.int64)
        sk = AmsSketch(width=1 << 12, depth=7)
        sk.add_hashes(keys, counts)
        np.testing.assert_array_equal(sk.estimate_hashes(keys), counts)
        # an absent key estimates near zero (noise only)
        absent = _rand_hashes(3, 12)
        assert (np.abs(sk.estimate_hashes(absent)) <= 1).all()

    def test_point_query_error_within_published_bound(self):
        """The sqrt(3 * F2 / w) bound is per-query with probability
        1 - 2^-Omega(depth) — at depth 7 a few percent of keys may exceed
        it, so over 3000 Zipf keys the right assertions are (a) >= 95% of
        queries inside the bound and (b) no query beyond a small multiple
        of it (the median of 7 unbiased rows cannot stray far)."""
        rng = np.random.default_rng(6)
        for seed in range(5):
            n_keys = 3000
            counts = (rng.zipf(1.5, size=n_keys) % 1000 + 1).astype(np.int64)
            keys = _rand_hashes(n_keys, 200 + seed)
            sk = AmsSketch(width=1 << 12, depth=7)
            sk.add_hashes(keys, counts)
            f2 = int((counts.astype(object) ** 2).sum())
            bound = (3.0 * f2 / sk.width) ** 0.5
            err = np.abs(sk.estimate_hashes(keys) - counts)
            frac_in = float((err <= bound).mean())
            assert frac_in >= 0.95, (seed, frac_in)
            assert int(err.max()) <= 8 * bound, (seed, int(err.max()), bound)

    def test_point_queries_merge_invariant(self):
        """Linearity again, but observed through the query surface: the
        merged sketch answers exactly like the single-stream sketch."""
        a_h, b_h = _rand_hashes(400, 13), _rand_hashes(400, 14)
        one = AmsSketch(width=1 << 10, depth=5)
        one.add_hashes(np.concatenate([a_h, b_h]))
        a, b = AmsSketch(width=1 << 10, depth=5), AmsSketch(width=1 << 10, depth=5)
        a.add_hashes(a_h)
        b.add_hashes(b_h)
        a.merge(b)
        q = np.concatenate([a_h[:50], b_h[:50]])
        np.testing.assert_array_equal(one.estimate_hashes(q), a.estimate_hashes(q))

    def test_point_queries_via_spark_estimate_counts(self, spark):
        """The duck-typed `estimate_counts` helper point-queries an AMS
        blob exactly like a CMS blob — CountSketch through the same
        broadcast path (unbiased, two-sided, vs CMS's one-sided)."""
        from sketchlib.spark.aggregate import sketch_agg
        from sketchlib.spark.heavy_hitters import estimate_counts
        from sketchlib.spark.specs import AmsSpec

        df = spark.range(6000).select(
            (F.col("id") % 37).cast("string").alias("k"))
        spec = AmsSpec(width=1 << 12, depth=7)
        [row] = sketch_agg(df, "k", (), spec).collect()
        out = estimate_counts(df.distinct(), "k", bytes(row["sketch"]),
                              spec=spec).collect()
        for r in out:
            true = len(range(int(r["k"]), 6000, 37))
            assert abs(r["est_count"] - true) <= 3, r

    def test_invalid_params_and_merge_mismatch(self):
        with pytest.raises(ValueError):
            AmsSketch(width=1000)  # not a power of two
        with pytest.raises(ValueError):
            AmsSketch(depth=0)
        a, b = AmsSketch(width=1 << 8), AmsSketch(width=1 << 9)
        with pytest.raises(ValueError):
            a.merge(b)

    def test_empty_sketch(self):
        sk = AmsSketch()
        assert sk.estimate_f2() == 0
        assert sk.count_additions == 0

    def test_spark_partition_invariance(self, spark):
        """Distributed build is bit-identical across partitionings — the
        merge-order-free property, end to end through the blob path."""
        from sketchlib.spark.aggregate import sketch_agg
        from sketchlib.spark.specs import AmsSpec

        df = spark.range(5000).select(
            (F.col("id") % 137).cast("long").alias("k"))
        spec = AmsSpec(width=1 << 10, depth=5)
        blobs = []
        for n in (1, 7):
            [row] = sketch_agg(df.repartition(n), "k", (), spec).collect()
            blobs.append(bytes(row["sketch"]))
        assert blobs[0] == blobs[1]
        exact = 5000 // 137  # not needed; just sanity that estimate is sane
        sk = AmsSketch.from_bytes(blobs[0])
        f2_exact = sum(c * c for c in
                       [len(range(i, 5000, 137)) for i in range(137)])
        assert abs(sk.estimate_f2() - f2_exact) <= 0.2 * f2_exact
        assert exact >= 0


class TestCmsInnerProduct:
    def test_matches_brute_force_bounds(self):
        """est >= sum_k a_k*b_k always; equals it when width >> keys."""
        keys = _rand_hashes(20, 6)
        a_counts = np.arange(1, 21, dtype=np.int64)
        b_counts = np.arange(21, 1, -1, dtype=np.int64)
        a = CountMinSketch(width=1 << 12, depth=5)
        b = CountMinSketch(width=1 << 12, depth=5)
        a.add_hashes(keys, a_counts)
        b.add_hashes(keys[:10], b_counts[:10])  # partial overlap universe
        exact = int(sum(int(x) * int(y) for x, y in
                        zip(a_counts[:10], b_counts[:10])))
        assert a.inner_product(b) == exact  # no collisions at this width
        assert b.inner_product(a) == exact  # symmetric

    def test_collision_overcount_is_one_sided(self):
        keys = _rand_hashes(5000, 7)
        a = CountMinSketch(width=1 << 6, depth=3)
        b = CountMinSketch(width=1 << 6, depth=3)
        a.add_hashes(keys)
        b.add_hashes(keys)
        assert a.inner_product(b) >= 5000  # true inner product (all counts 1)

    def test_dimension_mismatch_raises(self):
        with pytest.raises(ValueError):
            CountMinSketch(width=1 << 6).inner_product(CountMinSketch(width=1 << 7))

    def test_join_size_estimate_sandwich(self, spark, sf_dir):
        from sketchlib.spark.joinest import join_size_estimate
        from sketchlib.spark.specs import CmsSpec

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        jse = join_size_estimate(orders, "o_orderkey", li, "l_orderkey",
                                 CmsSpec(width=1 << 12, depth=5))
        exact = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert jse.estimate >= exact
        assert jse.estimate <= exact + jse.upper_margin
        assert jse.n_left == orders.count() and jse.n_right == li.count()


class TestProfiler:
    def test_exact_fields_and_nulls(self, spark):
        from sketchlib.spark.profile import profile_columns

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (None, "c"), (2, "a")],
            "x int, s string")
        rows = {r["column"]: r for r in profile_columns(df).collect()}
        assert rows["x"]["n_rows"] == 4 and rows["x"]["n_nulls"] == 1
        assert rows["x"]["min_value"] == "1" and rows["x"]["max_value"] == "2"
        assert rows["x"]["distinct_estimate"] == 2  # direct-count mode: exact
        assert rows["s"]["n_nulls"] == 1
        assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "c"
        assert rows["s"]["distinct_estimate"] == 2

    def test_all_null_column(self, spark):
        from sketchlib.spark.profile import profile_columns

        df = spark.createDataFrame([(None,), (None,)], "x int")
        [r] = profile_columns(df, ["x"]).collect()
        assert r["n_nulls"] == 2 and r["distinct_estimate"] == 0
        assert r["min_value"] is None and r["max_value"] is None

    def test_requires_columns(self, spark):
        from sketchlib.spark.profile import profile_columns

        with pytest.raises(ValueError):
            profile_columns(spark.range(1), [])


class TestDiscovery:
    def test_containment_estimator(self):
        """Containment on exact-mode sketches (n < k) is exact."""
        u = _rand_hashes(1000, 8)
        a, b = ThetaSketch(k=4096), ThetaSketch(k=4096)
        a.add_hashes(u[:400])
        b.add_hashes(u[100:1000])  # covers 300 of a's 400
        assert a.containment(b) == pytest.approx(300 / 400)
        assert ThetaSketch(k=64).containment(a) == 0.0  # empty A

    def test_containment_sampled_regime(self):
        """Above k the estimator stays within a few RSE of truth."""
        u = _rand_hashes(200_000, 9)
        a, b = ThetaSketch(k=4096), ThetaSketch(k=4096)
        a.add_hashes(u[:100_000])
        b.add_hashes(u[50_000:200_000])  # true containment 0.5
        assert abs(a.containment(b) - 0.5) < 0.05

    def test_cross_width_integral_normalization(self, spark):
        """An int column and a bigint column with the same values must be
        discovered as joinable — Spark's xxhash64 differs across integral
        widths, so the melt widens to bigint first."""
        from sketchlib.spark.discovery import column_sketches, joinable_pairs

        t1 = spark.createDataFrame([(i,) for i in range(50)], "k int")
        t2 = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
        sks = column_sketches({"t1": t1, "t2": t2}, {"t1": ["k"], "t2": ["k"]})
        got = {(r.col_a, r.col_b) for r in joinable_pairs(spark, sks).collect()}
        assert got == {("t1.k", "t2.k"), ("t2.k", "t1.k")}

    def test_no_pairs_below_threshold(self, spark):
        from sketchlib.spark.discovery import column_sketches, joinable_pairs

        t1 = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
        t2 = spark.createDataFrame([(i,) for i in range(1000, 1100)], "k bigint")
        sks = column_sketches({"t1": t1, "t2": t2}, {"t1": ["k"], "t2": ["k"]})
        assert joinable_pairs(spark, sks).count() == 0
