"""Deterministic sampling operators (sketchlib.sampling)."""

import pytest
from pyspark.sql import functions as F

from sketchlib.sampling import cap_per_group, hash_split, sample_by_hash


def _docs(spark, n=500, hosts=10):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % hosts).cast("string").alias("host"),
        (F.col("id") * 37 % 101).alias("score"))


def test_cap_per_group_exact_first_n(spark):
    df = _docs(spark)
    kept = cap_per_group(df, "host", 3, "doc_id")
    rows = sorted((r["host"], r["doc_id"]) for r in kept.collect())
    # first 3 doc_ids of host h are h, h+10, h+20
    expect = sorted((str(h), h + 10 * i) for h in range(10) for i in range(3))
    assert rows == expect


def test_cap_partition_invariance(spark):
    df = _docs(spark, n=1000)
    a = cap_per_group(df.repartition(1), "host", 7, "doc_id")
    b = cap_per_group(df.repartition(13), "host", 7, "doc_id")
    ra = sorted(r["doc_id"] for r in a.collect())
    assert ra == sorted(r["doc_id"] for r in b.collect())


def test_cap_plan_has_partial_window_group_limit(spark):
    """The scale property: Catalyst's rank-limit pushdown must pre-cap
    map-side (Partial WindowGroupLimit BEFORE the exchange), so a hub
    group ships cap x n_partitions rows, not its full size."""
    df = _docs(spark, n=100)
    kept = cap_per_group(df, "host", 3, "doc_id")
    plan = kept._jdf.queryExecution().executedPlan().toString()
    partial = plan.index("Partial")
    assert "WindowGroupLimit" in plan[:partial + 30]
    assert "Exchange" in plan
    assert plan.index("Exchange") < partial  # printed top-down: Final
    # WindowGroupLimit / Exchange / Partial WindowGroupLimit / scan


def test_cap_smaller_groups_untouched(spark):
    df = _docs(spark, n=15, hosts=10)  # hosts 0-4 have 2 docs, 5-9 have 1
    kept = cap_per_group(df, "host", 5, "doc_id")
    assert kept.count() == 15


def test_cap_validates(spark):
    with pytest.raises(ValueError):
        cap_per_group(_docs(spark), "host", 0, "doc_id")


def test_hash_split_partition_and_growth_stability(spark):
    df = _docs(spark, n=2000)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r["doc_id"]: r["split"]
          for r in hash_split(df, "doc_id", w).collect()}
    s2 = {r["doc_id"]: r["split"]
          for r in hash_split(df.repartition(17), "doc_id", w).collect()}
    assert s1 == s2
    # growth stability: the first 1000 docs keep their split when 1000 more
    # arrive (computed above on the full 2000)
    small = {r["doc_id"]: r["split"]
             for r in hash_split(_docs(spark, n=1000), "doc_id", w).collect()}
    assert all(s1[k] == v for k, v in small.items())
    # every row assigned exactly one split; fractions in the right ballpark
    counts = {k: sum(1 for v in s1.values() if v == k) for k in w}
    assert sum(counts.values()) == 2000
    assert 0.7 < counts["train"] / 2000 < 0.9


def test_hash_split_validates(spark):
    df = _docs(spark)
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 1.5, "b": -0.5})


def test_sample_by_hash_nested_and_deterministic(spark):
    df = _docs(spark, n=5000)
    s10 = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.10).collect()}
    s01 = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.01).collect()}
    again = {r["doc_id"]
             for r in sample_by_hash(df.repartition(9), "doc_id", 0.10).collect()}
    assert s01 <= s10          # nested
    assert s10 == again        # partition-independent
    assert 0.05 < len(s10) / 5000 < 0.15
    other = {r["doc_id"]
             for r in sample_by_hash(df, "doc_id", 0.10, salt="other").collect()}
    assert other != s10        # independent draw under a different salt
    assert sample_by_hash(df, "doc_id", 0.0).count() == 0
    assert sample_by_hash(df, "doc_id", 1.0).count() == 5000


def test_cap_per_group_survives_user_rn_column(spark):
    """A pre-existing __rn column must pass through untouched."""
    from sketchlib.sampling import cap_per_group

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "d")],
        "g long, __rn long, v string")
    out = cap_per_group(df, ["g"], 2, ["v"])
    assert set(out.columns) == {"g", "__rn", "v"}
    got = {(r["g"], r["v"]): r["__rn"] for r in out.collect()}
    assert got == {(1, "a"): 10, (1, "b"): 20, (2, "d"): 5}


def test_mix_fractions_closed_form(spark):
    from sketchlib.sampling import mix_fractions

    # masses: a=600, b=300, c=100 rows; targets 50/25/25
    rows = [("a",)] * 600 + [("b",)] * 300 + [("c",)] * 100
    df = spark.createDataFrame(rows, "src string")
    fr = mix_fractions(df, "src", {"a": 0.5, "b": 0.25, "c": 0.25})
    # c is rarest vs target: budget = 100/0.25 = 400
    assert fr["c"] == pytest.approx(1.0)
    assert fr["a"] == pytest.approx(0.5 * 400 / 600)
    assert fr["b"] == pytest.approx(0.25 * 400 / 300)


def test_mix_by_source_shares_and_stability(spark):
    from sketchlib.sampling import mix_by_source

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("src"))
    targets = {"s0": 0.4, "s1": 0.3, "s2": 0.2, "s3": 0.1}
    kept = mix_by_source(df, "src", targets, "doc_id")
    counts = {r["src"]: r["n"] for r in
              kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # budget = min(1000/w) = 1000/0.4 = 2500; expected kept: w * 2500
    import math
    for s, w in targets.items():
        want = w * 2500
        frac = want / 1000
        tol = 6 * math.sqrt(max(frac * (1 - frac) * 1000, 1)) + 1
        assert abs(counts.get(s, 0) - want) <= tol, (s, counts.get(s), want)
    # deterministic and partition-independent
    kept2 = mix_by_source(df.repartition(7), "src", targets, "doc_id")
    assert (sorted(r["doc_id"] for r in kept.collect())
            == sorted(r["doc_id"] for r in kept2.collect()))
    # untargeted source is dropped entirely
    t2 = {"s0": 0.5, "s1": 0.5}
    kept3 = mix_by_source(df, "src", t2, "doc_id")
    assert kept3.filter(F.col("src").isin("s2", "s3")).count() == 0


def test_mix_by_source_weighted_and_validates(spark):
    from sketchlib.sampling import mix_by_source, mix_fractions

    df = spark.createDataFrame(
        [(i, "big" if i < 100 else "small", 100 if i < 100 else 10)
         for i in range(150)], "doc_id long, src string, tokens long")
    # mass: big=10000, small=500; equal targets -> budget = 500/0.5 = 1000
    fr = mix_fractions(df, "src", {"big": 0.5, "small": 0.5}, "tokens")
    assert fr["small"] == pytest.approx(1.0)
    assert fr["big"] == pytest.approx(0.05)
    with pytest.raises(ValueError):
        mix_by_source(df, "src", {"big": 0.7, "small": 0.2}, "doc_id")
    with pytest.raises(ValueError):
        mix_by_source(df, "src", {"big": 0.5, "absent": 0.5}, "doc_id")


# --- weighted_sample_per_group -------------------------------------------

def test_weighted_sample_caps_and_determinism(spark):
    from sketchlib.sampling import weighted_sample_per_group

    rows = [(g, i, float(1 + (i % 5))) for g in ("a", "b") for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    got = weighted_sample_per_group(df, "grp", "w", 7, "id")
    per = {r["grp"]: 0 for r in got.collect()}
    for r in got.collect():
        per[r["grp"]] = per.get(r["grp"], 0) + 1
    assert per == {"a": 7, "b": 7}
    a = sorted(map(tuple, weighted_sample_per_group(
        df.repartition(1), "grp", "w", 7, "id").collect()))
    b = sorted(map(tuple, weighted_sample_per_group(
        df.repartition(9), "grp", "w", 7, "id").collect()))
    assert a == b


def test_weighted_sample_k1_matches_weight_shares(spark):
    """k=1 Efraimidis-Spirakis inclusion probability is exactly w_i/sum(w):
    over many independent salts, the heavy item (w=7 of total 10) must win
    ~70% of draws."""
    from sketchlib.sampling import weighted_sample_per_group

    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 1, 1.0), ("g", 2, 1.0), ("g", 3, 7.0)],
        "grp string, id long, w double")
    wins = 0
    n_trials = 200
    for t in range(n_trials):
        [r] = weighted_sample_per_group(df, "grp", "w", 1, "id",
                                        salt=f"trial-{t}").collect()
        wins += r["id"] == 3
    # Binomial(200, 0.7): sd ~ 6.5; allow 4 sd
    assert abs(wins - 140) <= 26, wins


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    import pytest
    from sketchlib.sampling import weighted_sample_per_group

    df = spark.createDataFrame(
        [("g", 1, 0.0), ("g", 2, -3.0), ("g", 3, None), ("g", 4, 2.0)],
        "grp string, id long, w double")
    got = weighted_sample_per_group(df, "grp", "w", 10, "id").collect()
    assert [r["id"] for r in got] == [4]
    with pytest.raises(ValueError):
        weighted_sample_per_group(df, "grp", "w", 0, "id")


def test_weighted_sample_plan_pre_caps(spark):
    from sketchlib.sampling import weighted_sample_per_group

    df = spark.createDataFrame(
        [("g", i, 1.0 + i) for i in range(100)],
        "grp string, id long, w double")
    plan = weighted_sample_per_group(df, "grp", "w", 5, "id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_weighted_sample_excludes_nan_weights(spark):
    """Spark orders NaN LARGER than every number, so a NaN weight passes
    `> 0` and its NaN sort key ranks first under desc — NaN rows would
    displace the whole sample."""
    from sketchlib.sampling import weighted_sample_per_group

    rows = ([(i, "g", 10.0) for i in range(20)]
            + [(100 + i, "g", float("nan")) for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")
    got = {r["doc_id"] for r in
           weighted_sample_per_group(df, k=5, group_cols=["src"],
                                     weight_col="w",
                                     id_cols=["doc_id"]).collect()}
    assert len(got) == 5 and all(i < 100 for i in got)


def test_mix_fractions_all_null_mass_clear_error(spark):
    """SUM over an all-NULL weight column is NULL -> must route into the
    'no mass' ValueError, not a bare float(None) TypeError."""
    import pytest

    from sketchlib.sampling import mix_fractions

    rows = [(1, "a", 10), (2, "b", None), (3, "b", None)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    with pytest.raises(ValueError, match="no mass"):
        mix_fractions(df, "src", {"a": 0.5, "b": 0.5}, weight_col="w")
