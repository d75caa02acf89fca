"""ComboSpec (one-scan multi-family sketch build) and the sketch-driven
skew diagnosis (sketchlib/spark/skewdiag.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.ams import AmsSketch
from sketchlib.spark.specs import (
    AmsSpec,
    CmsSpec,
    ComboSpec,
    DdSpec,
    KllSpec,
    MgSpec,
    ThetaSpec,
)
from sketchlib.theta import ThetaSketch


class TestComboSpec:
    def test_sub_blobs_bit_identical_to_individual_builds(self, spark):
        """One combined scan produces, per family, EXACTLY the bytes a
        dedicated scan produces — across partitionings."""
        from sketchlib.spark.aggregate import sketch_agg

        df = spark.range(20_000).select(
            (F.col("id") % 513).cast("long").alias("k"))
        subs = [ThetaSpec(k=512), AmsSpec(width=1 << 10, depth=5),
                MgSpec(k=64)]
        combo = ComboSpec(subs)
        for n_parts in (1, 7):
            d = df.repartition(n_parts)
            [row] = sketch_agg(d, "k", (), combo).collect()
            parts = combo.split_blob(bytes(row["sketch"]))
            for spec, blob in zip(subs, parts):
                [ind] = sketch_agg(d, "k", (), spec).collect()
                assert blob == bytes(ind["sketch"]), (spec.name, n_parts)

    def test_value_based_combo(self, spark):
        """KLL + DDSketch share one float64 stream; quantiles match the
        individually built sketches exactly."""
        from sketchlib.ddsketch import DDSketch
        from sketchlib.kll import KllSketch
        from sketchlib.spark.aggregate import sketch_agg

        df = spark.range(10_000).select(
            ((F.col("id") % 1000) / 10.0 + 0.1).alias("v"))
        combo = ComboSpec([KllSpec(k=200), DdSpec(alpha=0.01)])
        [row] = sketch_agg(df, "v", (), combo).collect()
        kll_b, dd_b = combo.split_blob(bytes(row["sketch"]))
        [ik] = sketch_agg(df, "v", (), KllSpec(k=200)).collect()
        [idd] = sketch_agg(df, "v", (), DdSpec(alpha=0.01)).collect()
        assert (KllSketch.from_bytes(kll_b).quantile(0.5)
                == KllSketch.from_bytes(bytes(ik["sketch"])).quantile(0.5))
        assert dd_b == bytes(idd["sketch"])  # DDSketch is order-free

    def test_rejects_mixed_and_mismatched_specs(self):
        with pytest.raises(ValueError, match="mix"):
            ComboSpec([ThetaSpec(), KllSpec()])
        with pytest.raises(ValueError, match="hash_name"):
            ComboSpec([ThetaSpec(hash_name="murmur3"),
                       AmsSpec(hash_name="fnv1a")])
        with pytest.raises(ValueError, match="at least one"):
            ComboSpec([])
        with pytest.raises(ValueError, match="prehashed"):
            ComboSpec([ThetaSpec(prehashed=True)])

    def test_wire_hardening(self):
        combo = ComboSpec([ThetaSpec(k=64), AmsSpec(width=1 << 8, depth=3)])
        sks = combo.make()
        combo.ingest(sks, np.arange(100, dtype=np.uint64) * np.uint64(2**40))
        blob = combo.to_bytes(sks)
        roundtrip = combo.from_bytes(blob)
        assert isinstance(roundtrip[0], ThetaSketch)
        assert isinstance(roundtrip[1], AmsSketch)
        for bad in (b"", b"XX" + blob[2:], blob[:-3], blob + b"\x00",
                    blob[:7]):
            with pytest.raises(ValueError):
                combo.from_bytes(bad)
        # family-count mismatch: a 1-family blob read by a 2-family spec
        one = ComboSpec([ThetaSpec(k=64)])
        s1 = one.make()
        one.ingest(s1, np.arange(10, dtype=np.uint64))
        with pytest.raises(ValueError, match="families"):
            combo.from_bytes(one.to_bytes(s1))

    def test_estimate_is_first_family(self):
        combo = ComboSpec([ThetaSpec(k=1 << 12), AmsSpec()])
        sks = combo.make()
        h = np.random.default_rng(3).integers(0, 2**64, 500, dtype=np.uint64)
        combo.ingest(sks, h)
        assert combo.estimate(sks) == sks[0].count() == 500

    def test_estimate_type_follows_first_family(self, spark):
        """A value-based first sub-spec estimates a double median; the
        declared estimate column type must match (a hardcoded LongType
        would silently truncate 0.75 -> 0)."""
        from pyspark.sql import types as T

        from sketchlib.spark.aggregate import estimate_col, sketch_agg
        from sketchlib.spark.specs import DdSpec

        combo = ComboSpec([KllSpec(k=200), DdSpec(alpha=0.01)])
        assert combo.estimate_type == T.DoubleType()
        assert ComboSpec([ThetaSpec(), AmsSpec()]).estimate_type == T.LongType()
        df = spark.range(101).select((F.col("id") / 100.0 + 0.25).alias("v"))
        agged = sketch_agg(df, "v", (), combo)
        [row] = agged.select(estimate_col(combo).alias("med")).collect()
        assert abs(row["med"] - 0.75) < 0.02  # a long column would hold 0

    def test_merge_matches_concat(self):
        combo = ComboSpec([ThetaSpec(k=256), AmsSpec(width=1 << 8, depth=3)])
        rng = np.random.default_rng(4)
        a_h = rng.integers(0, 2**64, 300, dtype=np.uint64)
        b_h = rng.integers(0, 2**64, 400, dtype=np.uint64)
        both = combo.make()
        combo.ingest(both, np.concatenate([a_h, b_h]))
        a, b = combo.make(), combo.make()
        combo.ingest(a, a_h)
        combo.ingest(b, b_h)
        merged = combo.merge(a, b)
        assert combo.to_bytes(merged) == combo.to_bytes(both)


class TestSkewDiagnosis:
    @pytest.fixture(scope="class")
    def hub_df(self, spark):
        """50%-hub key: half the rows share one value, the rest spread
        over 10k values — the lang-skew shape the north rule names."""
        return spark.range(100_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(-1))
            .otherwise(F.col("id") % 10_000).cast("long").alias("k"))

    def test_hub_detected_with_valid_sandwich(self, spark, hub_df):
        from sketchlib.spark.skewdiag import diagnose_skew

        diag = diagnose_skew(hub_df, "k", k=5)
        exact = {r["k"]: r["cnt"] for r in
                 hub_df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
        assert diag.n_rows == 100_000
        top_val, est, lower = diag.hot_keys[0]
        assert top_val == -1
        assert lower <= exact[-1] <= est
        # theta NDV within 4 sigma of the exact distinct count
        ndv_exact = len(exact)
        assert abs(diag.ndv - ndv_exact) <= 4 * diag.ndv_rse * ndv_exact
        # F2 within the AMS bound; exact F2 = sum c^2
        f2_exact = sum(c * c for c in exact.values())
        assert abs(diag.f2 - f2_exact) <= 6.8 * (2.0 / (1 << 12)) ** 0.5 * f2_exact
        # collision mass reflects the hub: ~share^2 = 0.25
        assert 0.2 <= diag.collision_prob <= 0.3

    def test_salting_recommendation(self, spark, hub_df):
        from sketchlib.spark.skewdiag import diagnose_skew

        diag = diagnose_skew(hub_df, "k", k=5)
        # hub holds ~50% of rows: at 64 partitions the hot task would be
        # ~33x average -> salt with >= ceil(0.5*64)=32 buckets (upper-bound
        # derived, so never below the exact-share requirement)
        assert diag.skew_factor(64) > 20
        assert diag.salt_buckets(64) >= 32
        assert diag.recommendation(64).startswith("salt(")
        # a uniform key on the same rows: no salting needed
        uni = hub_df.select((F.monotonically_increasing_id() % 10_000)
                            .alias("k"))
        d2 = diagnose_skew(uni, "k", k=5)
        assert d2.recommendation(64) == "none"

    def test_empty_and_single_value(self, spark):
        from sketchlib.spark.skewdiag import diagnose_skew

        one = spark.range(1000).select(F.lit(7).cast("long").alias("k"))
        d = diagnose_skew(one, "k", k=3)
        assert d.n_rows == 1000 and d.ndv == 1
        assert d.hot_keys[0][0] == 7
        assert d.top_share_upper >= 1.0
        assert d.salt_buckets(16) == 16  # full spread, clamped to P


class TestJoinAdvice:
    def test_estimates_and_sandwich(self, spark):
        """lineitem-shaped join: est_join_rows >= exact always (CMS is
        one-sided) and <= exact + upper_margin; NDV/F2 near exact."""
        from sketchlib.spark.skewdiag import advise_join

        left = spark.range(30_000).select((F.col("id") % 3_000).alias("k"))
        right = spark.range(3_000).select(F.col("id").alias("k"))
        adv = advise_join(left, "k", right, "k")
        exact = 30_000  # every right key matches 10 left rows
        assert exact <= adv.est_join_rows <= exact + adv.upper_margin
        assert adv.n_left == 30_000 and adv.n_right == 3_000
        assert abs(adv.ndv_left - 3_000) <= 0.1 * 3_000
        assert abs(adv.ndv_right - 3_000) <= 0.1 * 3_000
        # all-distinct side: exact F2 == n; the AMS estimate is within
        # its published median-of-rows bound, not exact
        assert abs(adv.f2_right - 3_000) <= 6.8 * (2.0 / (1 << 12)) ** 0.5 * 3_000

    def test_strategy_broadcast_and_salt(self, spark):
        from sketchlib.spark.skewdiag import advise_join

        left = spark.range(50_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(-1))
            .otherwise(F.col("id")).alias("k"))
        right = spark.range(1_000).select(F.col("id").alias("k"))
        adv = advise_join(left, "k", right, "k")
        # right side fits any broadcast budget
        assert adv.strategy(broadcast_rows=10_000) == "broadcast_right"
        # deny broadcast: the 50%-hub left side must trip the salt flag
        # (F2/n^2 lower bound ~ 0.25; 0.25 * 200 partitions >> 2)
        s = adv.strategy(broadcast_rows=100)
        assert s.startswith("shuffle") and "+salt_left" in s
        assert "+salt_right" not in s
        assert adv.fanout >= 0.0

    def test_strategy_salt_threshold_matches_skew_factor_semantics(self):
        """strategy uses the same hot-task model as
        SkewDiagnosis.skew_factor (share*P + 1): a share whose s*P lands
        in (tolerance-1, tolerance] still means a >tolerance-x-average
        hot task and must salt."""
        from sketchlib.spark.skewdiag import JoinAdvice

        adv = JoinAdvice(
            n_left=1_000_000, n_right=1_000_000, ndv_left=1000,
            ndv_right=1_000_000, f2_left=7_500_000_000,  # share 0.0075
            f2_right=1_000_000,                          # share 1e-6
            est_join_rows=0, upper_margin=0.0)
        # hot-task factor left = 0.0075 * 200 + 1 = 2.5 > 2.0 tolerance
        s = adv.strategy(broadcast_rows=100, n_partitions=200,
                         skew_tolerance=2.0)
        assert "+salt_left" in s and "+salt_right" not in s

    def test_strategy_bloom_prune_flag(self):
        """A too-big-to-broadcast join with a low estimated matching
        fraction on the big side recommends Bloom pruning it; a high
        fraction (most big-side rows match) does not."""
        from sketchlib.spark.skewdiag import JoinAdvice

        low = JoinAdvice(
            n_left=10_000_000, n_right=2_000_000, ndv_left=10_000_000,
            ndv_right=2_000_000, f2_left=10_000_000, f2_right=2_000_000,
            est_join_rows=100_000, upper_margin=0.0)
        s = low.strategy(broadcast_rows=100)
        assert s.startswith("shuffle") and "+bloom_prune_left" in s
        high = JoinAdvice(
            n_left=10_000_000, n_right=2_000_000, ndv_left=10_000_000,
            ndv_right=2_000_000, f2_left=10_000_000, f2_right=2_000_000,
            est_join_rows=9_000_000, upper_margin=0.0)
        assert "bloom_prune" not in high.strategy(broadcast_rows=100)
