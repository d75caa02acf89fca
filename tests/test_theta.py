"""Theta/KMV sketch: exactness below k, published error bound beyond,
bit-for-bit associative/commutative merges, set algebra accuracy, wire
roundtrip, and Spark two-stage pipeline integration."""

import numpy as np
import pytest

from sketchlib.hashing import HASHES
from sketchlib.theta import ThetaSketch


def _hash_ints(vals) -> np.ndarray:
    scalar, _flat = HASHES["murmur3"]
    return np.array([scalar(int(v).to_bytes(8, "little")) for v in vals],
                    dtype=np.uint64)


def _sketch_of(vals, k=4096) -> ThetaSketch:
    sk = ThetaSketch(k=k)
    sk.add_hashes(_hash_ints(vals))
    return sk


def test_exact_below_k():
    sk = _sketch_of(range(1000), k=4096)
    assert sk.count() == 1000
    assert sk.relative_std_error() == 0.0


def test_estimation_accuracy_beyond_k():
    rng = np.random.default_rng(7)
    n = 200_000
    sk = ThetaSketch(k=4096)
    # uniform random full-64-bit values stand in for hashes
    sk.add_hashes(rng.integers(0, (1 << 64) - 1, size=n, dtype=np.uint64,
                               endpoint=True))
    est = sk.count()
    rse = 1.0 / np.sqrt(4096 - 1)
    assert abs(est - n) / n <= 6 * rse


def test_duplicates_do_not_inflate():
    sk = _sketch_of(list(range(500)) * 10)
    assert sk.count() == 500
    assert sk.count_additions == 5000


def test_merge_bitwise_associative_commutative():
    a = _sketch_of(range(0, 60_000), k=1024)
    b = _sketch_of(range(40_000, 100_000), k=1024)
    c = _sketch_of(range(90_000, 130_000), k=1024)
    ab_c = a.copy().merge(b).merge(c)
    c_ba = c.copy().merge(b).merge(a)
    a_cb = a.copy().merge(c).merge(b)
    assert ab_c.to_bytes() == c_ba.to_bytes() == a_cb.to_bytes()
    n = 130_000
    assert abs(ab_c.count() - n) / n <= 6 / np.sqrt(1024 - 1)


def test_k_mismatch_raises():
    with pytest.raises(ValueError):
        ThetaSketch(k=1024).merge(ThetaSketch(k=2048))


def test_wire_roundtrip_and_hardening():
    for vals in (range(10), range(50_000)):
        sk = _sketch_of(vals, k=512)
        rt = ThetaSketch.from_bytes(sk.to_bytes())
        assert rt == sk and rt.count() == sk.count()
    with pytest.raises(ValueError):
        ThetaSketch.from_bytes(b"XXXX" + b"\x00" * 30)
    blob = bytearray(_sketch_of(range(50_000), k=512).to_bytes())
    blob[4 + 16 + 8:4 + 16 + 16] = blob[4 + 16:4 + 16 + 8]  # duplicate entry
    with pytest.raises(ValueError):
        ThetaSketch.from_bytes(bytes(blob))
    with pytest.raises(ValueError):
        ThetaSketch.from_bytes(bytes(_sketch_of(range(5)).to_bytes())[:-1])


def test_intersection_and_difference():
    # |A|=80k, |B|=60k, |A∩B|=40k
    a = _sketch_of(range(0, 80_000), k=4096)
    b = _sketch_of(range(40_000, 140_000 - 40_000), k=4096)
    est, c = a.intersect_count(b)
    assert c > 0
    assert abs(est - 40_000) / 40_000 <= 6 / np.sqrt(c)
    est_d, cd = a.a_not_b_count(b)
    assert abs(est_d - 40_000) / 40_000 <= 6 / np.sqrt(cd)
    j = a.jaccard(b)
    assert abs(j - 40_000 / 100_000) <= 0.05


def test_tiny_intersection_of_large_sets():
    # the case where HLL inclusion-exclusion falls apart: 1M-element sets
    # sharing only 200 elements — theta must not hallucinate a big overlap
    a = _sketch_of(range(0, 100_000), k=4096)
    b = _sketch_of(list(range(99_800, 100_000)) + list(range(200_000, 299_800)),
                   k=4096)
    est, c = a.intersect_count(b)
    # θ ≈ 4096/100k = 4% -> expect c ≈ 8 witnesses; just require the estimate
    # lands within a few std devs of 200 (σ ≈ 200/sqrt(max(c,1)))
    sigma = 200 / np.sqrt(max(c, 1))
    assert abs(est - 200) <= 6 * sigma + 50


def test_from_unique_hashes_matches_incremental():
    h = np.unique(_hash_ints(range(30_000)))
    inc = ThetaSketch(k=2048)
    inc.add_hashes(h)
    direct = ThetaSketch.from_unique_hashes(h, k=2048,
                                            count_additions=h.shape[0])
    assert direct.to_bytes() == inc.to_bytes()


@pytest.mark.usefixtures("spark")
def test_spark_pipeline_partition_invariance(spark):
    from sketchlib.spark.aggregate import sketch_agg
    from sketchlib.spark.specs import ThetaSpec

    rows = [(f"u{i % 7000}", "en" if i % 3 else "de") for i in range(30_000)]
    df = spark.createDataFrame(rows, "url string, lang string")
    spec = ThetaSpec(k=1024)
    b1 = {r["lang"]: bytes(r["sketch"])
          for r in sketch_agg(df.repartition(1), "url", ["lang"], spec).collect()}
    b9 = {r["lang"]: bytes(r["sketch"])
          for r in sketch_agg(df.repartition(9), "url", ["lang"], spec).collect()}
    assert b1 == b9
    from pyspark.sql import functions as F

    exact = {r["lang"]: r["n"]
             for r in df.groupBy("lang").agg(
                 F.countDistinct("url").alias("n")).collect()}
    for lang, blob in b1.items():
        est = ThetaSketch.from_bytes(blob).count()
        n = exact[lang]
        assert abs(est - n) / n <= 6 / np.sqrt(1024 - 1)
