"""t-digest and KLL: rank-error bounds, merge semantics, determinism,
wire round-trips, and the Spark approx_quantiles operator."""

import numpy as np
import pytest

from sketchlib.kll import KllSketch
from sketchlib.tdigest import TDigest

PROBS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(sketch, data, probs=PROBS):
    """max rank distance from q to the estimated quantile's *rank interval*
    [P(x < est), P(x <= est)] — with ties a value occupies an interval, and
    any q inside it is exactly answered."""
    data = np.sort(data)
    n = data.shape[0]
    errs = []
    for q in probs:
        est = sketch.quantile(q)
        lo = np.searchsorted(data, est, side="left") / n
        hi = np.searchsorted(data, est, side="right") / n
        errs.append(max(0.0, lo - q, q - hi))
    return max(errs)


@pytest.fixture(params=["uniform", "lognormal", "bimodal", "integer-heavy-ties"])
def data(request):
    rng = np.random.default_rng(13)
    n = 100_000
    if request.param == "uniform":
        return rng.uniform(0, 1000, n)
    if request.param == "lognormal":
        return rng.lognormal(3.0, 1.5, n)
    if request.param == "bimodal":
        return np.concatenate([rng.normal(10, 1, n // 2), rng.normal(1000, 50, n // 2)])
    return rng.zipf(1.5, n).astype(np.float64)  # huge tie mass at small ints


class TestTDigest:
    def test_rank_error(self, data):
        td = TDigest(delta=200)
        td.add_values(data)
        assert _rank_error(td, data) <= 0.02

    def test_size_bounded(self, data):
        td = TDigest(delta=200)
        td.add_values(data)
        td._flush()
        assert td.means.shape[0] <= 200

    def test_min_max_exact(self, data):
        td = TDigest()
        td.add_values(data)
        assert td.quantile(0.0) == data.min()
        assert td.quantile(1.0) == data.max()

    def test_merge_matches_single(self, data):
        parts = np.array_split(data, 7)
        digests = []
        for p in parts:
            d = TDigest()
            d.add_values(p)
            digests.append(d)
        merged = TDigest.from_bytes(digests[0].to_bytes())
        for d in digests[1:]:
            merged.merge(d)
        assert merged.count_additions == data.shape[0]
        assert _rank_error(merged, data) <= 0.02

    def test_merge_commutative_estimate_level(self, data):
        a, b = TDigest(), TDigest()
        a.add_values(data[: len(data) // 2])
        b.add_values(data[len(data) // 2:])
        ab = TDigest.from_bytes(a.to_bytes()); ab.merge(b)
        ba = TDigest.from_bytes(b.to_bytes()); ba.merge(a)
        for q in PROBS:
            x, y = ab.quantile(q), ba.quantile(q)
            span = data.max() - data.min()
            assert abs(x - y) <= 0.02 * span + 1e-9

    def test_deterministic_same_input(self, data):
        a, b = TDigest(), TDigest()
        a.add_values(data)
        b.add_values(data)
        assert a.to_bytes() == b.to_bytes()

    def test_wire_roundtrip(self, data):
        td = TDigest()
        td.add_values(data[:5000])
        rt = TDigest.from_bytes(td.to_bytes())
        assert rt == td and rt.to_bytes() == td.to_bytes()

    def test_nan_skipped_empty(self):
        td = TDigest()
        td.add_values(np.array([np.nan, np.nan]))
        assert td.count_additions == 0
        assert np.isnan(td.quantile(0.5))
        with pytest.raises(ValueError):
            td.quantile(1.5)
        with pytest.raises(ValueError):
            TDigest(delta=5)
        a, b = TDigest(delta=100), TDigest(delta=200)
        with pytest.raises(ValueError):
            a.merge(b)


class TestKll:
    def test_rank_error(self, data):
        kll = KllSketch(k=200)
        kll.add_values(data)
        assert _rank_error(kll, data) <= 0.03

    def test_merge_matches_single(self, data):
        parts = np.array_split(data, 7)
        sketches = []
        for p in parts:
            s = KllSketch(k=200)
            s.add_values(p)
            sketches.append(s)
        merged = KllSketch.from_bytes(sketches[0].to_bytes())
        for s in sketches[1:]:
            merged.merge(s)
        assert merged.count_additions == data.shape[0]
        assert _rank_error(merged, data) <= 0.04

    def test_space_bound(self, data):
        kll = KllSketch(k=200)
        kll.add_values(data)
        stored = sum(c.shape[0] for c in kll.compactors)
        assert stored <= 3 * 200  # O(k) items for 100k inputs

    def test_deterministic_same_input(self, data):
        a, b = KllSketch(), KllSketch()
        a.add_values(data)
        b.add_values(data)
        assert a.to_bytes() == b.to_bytes()

    def test_extremes(self, data):
        kll = KllSketch()
        kll.add_values(data)
        assert kll.quantile(0.0) == data.min()
        assert kll.quantile(1.0) == data.max()

    def test_wire_roundtrip(self, data):
        s = KllSketch()
        s.add_values(data[:20_000])
        rt = KllSketch.from_bytes(s.to_bytes())
        assert rt == s and rt.to_bytes() == s.to_bytes()

    def test_validation(self):
        with pytest.raises(ValueError):
            KllSketch(k=4)
        a, b = KllSketch(k=100), KllSketch(k=200)
        with pytest.raises(ValueError):
            a.merge(b)
        with pytest.raises(ValueError):
            KllSketch.from_bytes(b"XX" + b"\x00" * 40)


class TestSparkQuantiles:
    @pytest.mark.parametrize("spec_name", ["tdigest", "kll"])
    def test_per_group_quantiles_vs_exact(self, spark, sf_dir, spec_name):
        from pyspark.sql import functions as F
        from sketchlib.spark.quantiles import approx_quantiles
        from sketchlib.spark.specs import KllSpec, TDigestSpec

        spec = TDigestSpec() if spec_name == "tdigest" else KllSpec()
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        probs = [0.1, 0.5, 0.9]
        got = {r["event_type"]: r["quantiles"]
               for r in approx_quantiles(ev, "value", probs, ["event_type"], spec).collect()}
        exact = {r["event_type"]: r["qs"] for r in ev.groupBy("event_type").agg(
            F.expr("percentile(value, array(0.1, 0.5, 0.9))").alias("qs")).collect()}
        pdf = ev.select("event_type", "value").toPandas()
        for etype, ests in got.items():
            vals = np.sort(pdf[pdf["event_type"] == etype]["value"].to_numpy())
            n = vals.shape[0]
            for q, est, ex in zip(probs, ests, exact[etype]):
                true_rank = np.searchsorted(vals, est, side="right") / n
                assert abs(true_rank - q) <= 0.05, (etype, q, est, ex)

    def test_global_median_estimate_col(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from sketchlib.spark.aggregate import sketch_agg, estimate_col
        from sketchlib.spark.specs import TDigestSpec

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        spec = TDigestSpec()
        merged = sketch_agg(li, "l_extendedprice", (), spec)
        [row] = merged.select(estimate_col(spec).alias("median")).collect()
        exact = li.selectExpr("percentile(l_extendedprice, 0.5)").first()[0]
        lo, hi = li.selectExpr("percentile(l_extendedprice, 0.45)",
                               "percentile(l_extendedprice, 0.55)").first()
        assert lo <= row["median"] <= hi, (row["median"], exact)

    def test_partition_count_invariance_estimates(self, spark, sf_dir):
        """Quantile estimates stay within bound at any parallelism (bit-level
        equality is not promised for order-sensitive compaction — rank error is)."""
        from sketchlib.spark.quantiles import approx_quantiles
        from sketchlib.spark.specs import TDigestSpec

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        vals = np.sort(np.array([r["value"] for r in ev.select("value").collect()]))
        n = vals.shape[0]
        for parts in (1, 5):
            [row] = approx_quantiles(ev.repartition(parts), "value", [0.5],
                                     (), TDigestSpec()).collect()
            est = row["quantiles"][0]
            true_rank = np.searchsorted(vals, est, side="right") / n
            assert abs(true_rank - 0.5) <= 0.03
