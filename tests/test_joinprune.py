"""Bloom-pruned joins (sketchlib/spark/joinprune.py): exact equivalence
to the plain join under every supported join type, null keys, duplicate
keys, multi-column keys, reused blobs, and a plan assertion that the
probe sits below the join."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sketchlib.spark.joinprune import key_bloom, pruned_join
from sketchlib.spark.specs import BloomSpec


def _fact(spark):
    rows = [Row(k=i % 7, g=i % 3, v=float(i)) for i in range(200)]
    rows += [Row(k=None, g=0, v=-1.0), Row(k=None, g=1, v=-2.0)]
    return spark.createDataFrame(rows)


def _dim(spark):
    # keys 0,2,4 present; 99 has no fact partner; one NULL dim key;
    # key 2 duplicated (fanout > 1)
    rows = [Row(k=0, name="a"), Row(k=2, name="b"), Row(k=2, name="b2"),
            Row(k=4, name="c"), Row(k=99, name="z"), Row(k=None, name="n")]
    return spark.createDataFrame(rows)


def _sorted_rows(df):
    return sorted(tuple(repr(x) for x in r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left_semi", "left_anti"])
@pytest.mark.parametrize("broadcast_dim", [False, True])
def test_matches_plain_join(spark, how, broadcast_dim):
    fact, dim = _fact(spark), _dim(spark)
    plain = fact.join(dim, on="k", how=how)
    pruned = pruned_join(fact, dim, "k", how,
                         broadcast_dim=broadcast_dim)
    assert pruned.columns == plain.columns
    assert _sorted_rows(pruned) == _sorted_rows(plain)


def test_multi_column_keys(spark):
    fact, dim = _fact(spark), _dim(spark)
    dim2 = dim.withColumn("g", F.col("k") % 3)
    for how in ("inner", "left_anti"):
        plain = fact.join(dim2, on=["k", "g"], how=how)
        pruned = pruned_join(fact, dim2, ["k", "g"], how)
        assert _sorted_rows(pruned) == _sorted_rows(plain), how


def test_blob_reuse_and_key_bloom(spark):
    fact, dim = _fact(spark), _dim(spark)
    spec = BloomSpec(m_bits=1 << 12, k=5)
    blob = key_bloom(dim, "k", spec)
    assert isinstance(blob, bytes)
    out = pruned_join(fact, dim, "k", "left_semi", blob=blob, spec=spec)
    plain = fact.join(dim, "k", "left_semi")
    assert _sorted_rows(out) == _sorted_rows(plain)


def test_outer_join_raises(spark):
    fact, dim = _fact(spark), _dim(spark)
    with pytest.raises(ValueError, match="outer"):
        pruned_join(fact, dim, "k", "left_outer")


def test_empty_dim(spark):
    fact, dim = _fact(spark), _dim(spark)
    empty = dim.filter(F.lit(False))
    assert pruned_join(fact, empty, "k", "inner").count() == 0
    anti = pruned_join(fact, empty, "k", "left_anti")
    assert anti.count() == fact.count()


def test_undersized_filter_still_exact(spark):
    # fpp near 1: pruning stops paying but results stay exact
    fact, dim = _fact(spark), _dim(spark)
    spec = BloomSpec(m_bits=8, k=2)
    for how in ("inner", "left_anti"):
        plain = fact.join(dim, "k", how)
        pruned = pruned_join(fact, dim, "k", how, spec=spec)
        assert _sorted_rows(pruned) == _sorted_rows(plain), how


def test_probe_below_join_in_plan(spark):
    """The Bloom probe (a Python eval stage) must appear on the fact side
    BELOW the join, so only probe-true rows reach the join's exchange."""
    fact, dim = _fact(spark), _dim(spark)
    plan = pruned_join(fact, dim, "k", "inner")._jdf.queryExecution() \
        .optimizedPlan().toString()
    join_at = plan.find("Join")
    assert join_at >= 0, plan
    below = plan[join_at:]
    assert ("pythonUDF" in below) or ("ArrowEvalPython" in below) or (
        "BatchEvalPython" in below), plan


def test_randomized_equivalence_sweep(spark):
    """Seeded random frames (nulls, dup keys, disjoint/overlapping key
    ranges, tiny filters): pruned_join == plain join for every supported
    how, across 6 random shapes."""
    import random

    rng = random.Random(20260820)
    for trial in range(6):
        n_fact = rng.randrange(50, 300)
        n_dim = rng.randrange(1, 60)
        key_space = rng.randrange(3, 40)
        shift = rng.choice([0, 0, key_space])  # sometimes disjoint
        fact_rows = [(rng.randrange(key_space) if rng.random() > 0.1
                      else None, i) for i in range(n_fact)]
        dim_rows = [(rng.randrange(key_space) + shift if rng.random() > 0.1
                     else None, -i) for i in range(n_dim)]
        fact = spark.createDataFrame(fact_rows, "k bigint, v long")
        dim = spark.createDataFrame(dim_rows, "k bigint, w long")
        spec = BloomSpec(m_bits=1 << rng.randrange(4, 14),
                         k=rng.randrange(1, 8))
        for how in ("inner", "left_semi", "left_anti"):
            plain = _sorted_rows(fact.join(dim, "k", how))
            pruned = _sorted_rows(pruned_join(fact, dim, "k", how,
                                              spec=spec))
            assert pruned == plain, (trial, how)
