"""DDSketch: relative-error bound, bit-identical merges under any
partitioning (the closed-form-bucket property), wire round-trips, signed /
zero handling, and the Spark two-stage aggregation."""

import numpy as np
import pytest

from sketchlib.ddsketch import DDSketch

PROBS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.fixture(params=["uniform", "lognormal", "integer-heavy-ties", "signed"])
def data(request):
    rng = np.random.default_rng(7)
    n = 100_000
    if request.param == "uniform":
        return rng.uniform(1.0, 1000.0, n)
    if request.param == "lognormal":
        return rng.lognormal(3.0, 2.5, n)  # ~11 decades of tail
    if request.param == "integer-heavy-ties":
        return rng.zipf(1.5, n).astype(np.float64)
    return np.concatenate([rng.lognormal(2.0, 1.0, n // 2),
                           -rng.lognormal(2.0, 1.0, n // 2),
                           np.zeros(100)])


def _exact_quantile(data: np.ndarray, q: float) -> float:
    """Lower nearest-rank — the rule quantile_index pins."""
    s = np.sort(data)
    return float(s[int(np.floor(q * (s.shape[0] - 1)))])


class TestDDSketch:
    def test_relative_error_bound(self, data):
        sk = DDSketch(alpha=0.01)
        sk.add_values(data)
        for q in PROBS:
            est = sk.quantile(q)
            true = _exact_quantile(data, q)
            assert abs(est - true) <= 0.01 * abs(true) + 1e-9, (q, est, true)

    def test_merge_bit_identical_any_partitioning(self, data):
        """THE DDSketch selling point vs t-digest/KLL: same input -> same
        bytes no matter how the stream was split or the merge tree shaped."""
        whole = DDSketch(alpha=0.02)
        whole.add_values(data)
        for n_parts, order in ((3, 1), (17, -1)):
            parts = np.array_split(data, n_parts)[::order]
            merged = DDSketch(alpha=0.02)
            for p in parts:
                s = DDSketch(alpha=0.02)
                s.add_values(p)
                merged.merge(s)
            assert merged == whole
            assert merged.to_bytes() == whole.to_bytes()

    def test_signed_and_zero(self):
        sk = DDSketch(alpha=0.01)
        sk.add_values(np.array([-100.0, -1.0, 0.0, 0.0, 1.0, 100.0]))
        assert sk.zero_count == 2
        assert sk.quantile(0.0) <= -99.0
        assert abs(sk.quantile(0.5)) <= 1e-9  # rank 3 of 6 -> a zero
        assert sk.quantile(1.0) >= 99.0

    def test_tiny_values_land_in_zero_bucket(self):
        sk = DDSketch(alpha=0.01, min_positive=1e-9)
        sk.add_values(np.array([1e-12, -1e-12, 5e-10]))
        assert sk.zero_count == 3 and not sk.pos and not sk.neg

    def test_wire_roundtrip(self, data):
        sk = DDSketch(alpha=0.01)
        sk.add_values(data)
        rt = DDSketch.from_bytes(sk.to_bytes())
        assert rt == sk and rt.to_bytes() == sk.to_bytes()

    def test_quantile_index_matches_brute_force(self, data):
        sk = DDSketch(alpha=0.01)
        sk.add_values(data)
        # brute force: expand every bucket into (sort_key, count) and scan
        entries = ([(-sk.gamma ** i, c) for i, c in sk.neg.items()]
                   + ([(0.0, sk.zero_count)] if sk.zero_count else [])
                   + [(sk.gamma ** i, c) for i, c in sk.pos.items()])
        entries.sort()
        n = sk.count_additions
        for q in PROBS:
            target = int(np.floor(q * (n - 1))) + 1
            cum = 0
            for key, c in entries:
                cum += c
                if cum >= target:
                    break
            store, idx = sk.quantile_index(q)
            got_key = {"neg": -sk.gamma ** idx, "zero": 0.0,
                       "pos": sk.gamma ** idx if store == "pos" else None}[store]
            assert got_key == pytest.approx(key)

    def test_validation(self):
        with pytest.raises(ValueError):
            DDSketch(alpha=0.0)
        with pytest.raises(ValueError):
            DDSketch(alpha=1.0)
        with pytest.raises(ValueError):
            DDSketch(min_positive=0.0)
        a, b = DDSketch(alpha=0.01), DDSketch(alpha=0.02)
        with pytest.raises(ValueError):
            a.merge(b)
        with pytest.raises(ValueError):
            DDSketch.from_bytes(b"XX" + b"\x00" * 40)
        empty = DDSketch()
        assert np.isnan(empty.quantile(0.5))  # sibling-sketch convention
        with pytest.raises(ValueError):
            empty.quantile_index(0.5)
        with pytest.raises(ValueError):
            empty.quantile(1.5)
        with pytest.raises(ValueError):
            DDSketch(max_buckets=2).add_values(np.array([1.0, 10.0, 100.0]))

    def test_nan_skipped(self):
        sk = DDSketch()
        sk.add_values(np.array([np.nan, 5.0, np.nan]))
        assert sk.count_additions == 1
        assert sk.quantile(0.5) == pytest.approx(5.0, rel=0.02)

    def test_inf_skipped(self):
        # +inf must not wrap to INT64_MIN (the smallest positive bucket)
        # and corrupt every quantile; it is skipped exactly like NaN
        sk = DDSketch()
        sk.add_values(np.array([np.inf, 5.0, -np.inf, 7.0]))
        assert sk.count_additions == 2
        assert sk.quantile(0.0) == pytest.approx(5.0, rel=0.02)
        assert sk.quantile(1.0) == pytest.approx(7.0, rel=0.02)

    def test_failed_merge_leaves_cap_unchanged(self):
        a = DDSketch(max_buckets=2)
        a.add_values(np.array([1.0, 10.0]))
        b = DDSketch(max_buckets=3)
        b.add_values(np.array([100.0, 1000.0, 1e4]))
        # union is 5 buckets > the permissive cap of 3 -> must raise
        with pytest.raises(ValueError):
            a.merge(b)
        # a raising merge must not loosen a's overflow guard
        assert a.max_buckets == 2
        assert len(a.pos) == 2 and a.count_additions == 2
        with pytest.raises(ValueError):
            a.add_values(np.array([100.0]))

    def test_wire_rejects_nonfinite_min_positive(self):
        import struct as _s
        sk = DDSketch()
        sk.add_values(np.array([3.0]))
        blob = bytearray(sk.to_bytes())
        for bad in (float("nan"), float("inf")):
            _s.pack_into("<d", blob, 2 + 10, bad)  # min_positive field
            with pytest.raises(ValueError):
                DDSketch.from_bytes(bytes(blob))

    def test_bucket_count_bounded_by_range_not_size(self):
        rng = np.random.default_rng(3)
        sk = DDSketch(alpha=0.01)
        sk.add_values(rng.uniform(1.0, 1e6, 500_000))
        # log_gamma(1e6) ~ 691 buckets for 500k values
        assert len(sk.pos) <= 1 + int(np.ceil(np.log(1e6) / np.log(sk.gamma)))


class TestSparkDDSketch:
    def test_two_stage_agg_bit_identical_and_bounded(self, spark, sf_dir):
        from sketchlib.spark.aggregate import sketch_agg
        from sketchlib.spark.specs import DdSpec

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        spec = DdSpec(alpha=0.01)
        blobs = []
        for parts in (1, 7):
            [row] = sketch_agg(li.repartition(parts), "l_extendedprice",
                               (), spec).collect()
            blobs.append(bytes(row["sketch"]))
        assert blobs[0] == blobs[1]  # closed-form buckets: partition-invariant
        sk = DDSketch.from_bytes(blobs[0])
        for q in (0.25, 0.5, 0.95):
            exact = li.selectExpr(
                f"percentile(l_extendedprice, {q})").first()[0]
            assert abs(sk.quantile(q) - exact) <= 0.011 * exact

    def test_per_group_quantiles(self, spark, sf_dir):
        from sketchlib.spark.quantiles import approx_quantiles
        from sketchlib.spark.specs import DdSpec

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = {r["event_type"]: r["quantiles"] for r in approx_quantiles(
            ev, "value", [0.5], ["event_type"], DdSpec(alpha=0.01)).collect()}
        from pyspark.sql import functions as F
        exact = {r["event_type"]: r["m"] for r in ev.groupBy("event_type")
                 .agg(F.expr("percentile(value, 0.5)").alias("m")).collect()}
        for etype, [est] in got.items():
            # values may be <= 0 (sketch floors magnitudes at min_positive);
            # events.value is positive in the testdata, so plain relative check
            assert abs(est - exact[etype]) <= 0.011 * abs(exact[etype]) + 1e-6
