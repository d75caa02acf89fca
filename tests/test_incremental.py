"""Incremental cross-corpus dedup: Bloom-split exactness, sketch-mode
over-drop bound, null handling, mode equivalence."""

import pytest
from pyspark.sql import functions as F

from sketchlib.dedup.incremental import drop_seen, seen_bloom
from sketchlib.spark.specs import BloomSpec


def _corpora(spark):
    seen = spark.createDataFrame(
        [(i, f"seen document number {i} body text") for i in range(200)],
        "doc_id long, text string")
    # 300 new docs: ids 1000+; 80 are exact re-crawls of seen docs
    # (whitespace/case variants — normalization must still match),
    # 220 genuinely new
    rows = []
    for i in range(80):
        rows.append((1000 + i, f"  SEEN document NUMBER {i} body   text "))
    for i in range(220):
        rows.append((1080 + i, f"fresh document {i} never seen before"))
    new = spark.createDataFrame(rows, "doc_id long, text string")
    return seen, new


def test_exact_anti_join_mode(spark):
    seen, new = _corpora(spark)
    kept = drop_seen(new, seen)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == set(range(1080, 1300))
    assert kept.columns == new.columns  # temp columns cleaned up


def test_bloom_split_is_exact(spark):
    seen, new = _corpora(spark)
    blob = seen_bloom(seen)
    split = {r["doc_id"] for r in
             drop_seen(new, seen, bloom_blob=blob).collect()}
    plain = {r["doc_id"] for r in drop_seen(new, seen).collect()}
    assert split == plain == set(range(1080, 1300))


def test_sketch_mode_no_false_negatives_and_bounded_overdrop(spark):
    seen, new = _corpora(spark)
    # tiny filter -> measurable fpp; no false negatives regardless
    spec = BloomSpec(m_bits=1 << 12, k=4)
    blob = seen_bloom(seen, spec=spec)
    kept = {r["doc_id"] for r in
            drop_seen(new, bloom_blob=blob, spec=spec).collect()}
    # every true duplicate is dropped (Bloom has no false negatives)
    assert not kept & set(range(1000, 1080))
    # over-drop of genuinely-new docs bounded: theoretical fpp for
    # m=4096, k=4, n=200 is ~0.04%; allow generous slack
    fresh = set(range(1080, 1300))
    assert len(fresh - kept) <= 5


def test_null_text_never_dropped(spark):
    seen, new = _corpora(spark)
    new = new.unionByName(spark.createDataFrame(
        [(9999, None)], "doc_id long, text string"))
    blob = seen_bloom(seen)
    for kept in (drop_seen(new, seen),
                 drop_seen(new, seen, bloom_blob=blob),
                 drop_seen(new, bloom_blob=blob)):
        assert 9999 in {r["doc_id"] for r in kept.select("doc_id").collect()}


def test_temp_name_collision_guard(spark):
    seen, new = _corpora(spark)
    trap = new.withColumn("__fp", F.lit(0)).withColumn(
        "__seen_maybe", F.lit(True))
    kept = drop_seen(trap, seen)
    assert {"__fp", "__seen_maybe"} <= set(kept.columns)  # user cols intact
    assert kept.count() == 220


def test_requires_an_input(spark):
    _, new = _corpora(spark)
    with pytest.raises(ValueError):
        drop_seen(new)


def test_bloom_split_join_input_is_prefiltered(spark):
    """The exact anti-join's left side must be the probe-true candidates,
    not the whole increment: assert the join subtree contains the Python
    probe filter."""
    seen, new = _corpora(spark)
    blob = seen_bloom(seen)
    df = drop_seen(new, seen, bloom_blob=blob)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    # both union branches filter on the probe; the join appears once
    assert len(re.findall(r"SortMergeJoin .*LeftAnti|BroadcastHashJoin .*LeftAnti", plan)) == 1


def test_cuckoo_retract_roundtrip(spark):
    """Withdraw a shard from the retractable seen-set: its content is
    accepted again, everything still live keeps being dropped, and no
    genuinely-new doc is over-dropped beyond the fp bound."""
    from sketchlib.dedup.incremental import retract_seen, seen_cuckoo
    from sketchlib.spark.specs import CuckooSpec

    seen, new = _corpora(spark)
    spec = CuckooSpec(expected_n=1000)
    # seen = two shards: A (ids 0..99), B (ids 100..199)
    shard_a = seen.filter(F.col("doc_id") < 100)
    shard_b = seen.filter(F.col("doc_id") >= 100)
    blob = seen_cuckoo(seen, spec=spec)

    # before retract: the 80 recrawls (ids 1000..1079 match seen 0..79,
    # all in shard A) are dropped in pure-sketch mode
    kept0 = {r["doc_id"] for r in drop_seen(new, bloom_blob=blob,
                                            spec=spec).collect()}
    assert kept0.isdisjoint(set(range(1000, 1080)))

    # retract shard A -> its recrawls are accepted again; shard B stays
    blob2 = retract_seen(blob, shard_a, spec=spec)
    kept1 = {r["doc_id"] for r in drop_seen(new, bloom_blob=blob2,
                                            spec=spec).collect()}
    assert set(range(1000, 1080)) <= kept1          # freed content
    assert set(range(1080, 1300)) <= kept1          # fresh never dropped...
    # ...beyond the fp bound: with these sizes, zero is the expectation
    b_probe = drop_seen(
        spark.createDataFrame(
            [(i, f"seen document number {i} body text")
             for i in range(100, 200)], "doc_id long, text string"),
        bloom_blob=blob2, spec=spec)
    assert b_probe.count() == 0                     # shard B still seen


def test_cuckoo_retract_shared_content_freed(spark):
    """Identical text ingested via two shards occupies ONE distinct
    fingerprint; withdrawing either shard frees the content (the dedup
    pipeline only ever admitted one copy)."""
    from sketchlib.dedup.incremental import retract_seen, seen_cuckoo
    from sketchlib.spark.specs import CuckooSpec

    spec = CuckooSpec(expected_n=100)
    dup_text = "the same exact boilerplate in both shards"
    shard_a = spark.createDataFrame([(1, dup_text)], "doc_id long, text string")
    shard_b = spark.createDataFrame([(2, dup_text)], "doc_id long, text string")
    blob = seen_cuckoo(shard_a.unionByName(shard_b), spec=spec)
    blob = retract_seen(blob, shard_a, spec=spec)
    probe = spark.createDataFrame([(9, dup_text)], "doc_id long, text string")
    assert drop_seen(probe, bloom_blob=blob, spec=spec).count() == 1


def test_retract_seen_exact_keeps_shared_content(spark):
    """Content shared by a surviving shard is NOT forgotten; content unique
    to the withdrawn shard is freed; a second withdrawal then frees the
    shared content exactly once (no absent-key re-delete)."""
    from sketchlib.dedup.incremental import (retract_seen_exact, seen_cuckoo)
    from sketchlib.spark.specs import CuckooSpec

    spec = CuckooSpec(expected_n=100)
    shared = "the same exact boilerplate in both shards"
    only_a = "content unique to shard A"
    only_b = "content unique to shard B"
    shard_a = spark.createDataFrame(
        [(1, shared), (2, only_a)], "doc_id long, text string")
    shard_b = spark.createDataFrame(
        [(3, shared), (4, only_b)], "doc_id long, text string")
    blob = seen_cuckoo(shard_a.unionByName(shard_b), spec=spec)

    # withdraw A while B remains: only A-unique content is freed
    blob = retract_seen_exact(blob, shard_a, shard_b, spec=spec)
    probe = spark.createDataFrame(
        [(10, shared), (11, only_a), (12, only_b)], "doc_id long, text string")
    kept = {r["doc_id"] for r in
            drop_seen(probe, bloom_blob=blob, spec=spec).collect()}
    assert kept == {11}  # shared + B-unique still seen

    # now withdraw B with nothing remaining: everything freed
    blob = retract_seen_exact(blob, shard_b, [], spec=spec)
    kept2 = {r["doc_id"] for r in
             drop_seen(probe, bloom_blob=blob, spec=spec).collect()}
    assert kept2 == {10, 11, 12}


def test_retract_seen_exact_accepts_iterable_of_shards(spark):
    from sketchlib.dedup.incremental import retract_seen_exact, seen_cuckoo
    from sketchlib.spark.specs import CuckooSpec

    spec = CuckooSpec(expected_n=100)
    mk = lambda i, t: spark.createDataFrame([(i, t)], "doc_id long, text string")  # noqa: E731
    a, b, c = mk(1, "alpha text"), mk(2, "beta text"), mk(3, "alpha text")
    blob = seen_cuckoo(a.unionByName(b).unionByName(c), spec=spec)
    blob = retract_seen_exact(blob, a, [b, c], spec=spec)  # c still has alpha
    probe = mk(9, "alpha text")
    assert drop_seen(probe, bloom_blob=blob, spec=spec).count() == 0


def test_cuckoo_delete_bytes_guard_fires_bounded(spark):
    """A corpus-sized withdrawal raises instead of materializing on the
    driver; the limit is enforced executor-side (collect through LIMIT)."""
    from sketchlib.spark.membership import cuckoo_build_bytes, cuckoo_delete_bytes
    from sketchlib.spark.specs import CuckooSpec

    spec = CuckooSpec(expected_n=2000)
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    blob = cuckoo_build_bytes(df, "k", spec)
    with pytest.raises(ValueError, match="max_keys"):
        cuckoo_delete_bytes(blob, df, "k", spec, max_keys=100)
    # under the cap it works
    small = df.limit(10)
    out = cuckoo_delete_bytes(blob, small, "k", spec, max_keys=100)
    assert isinstance(out, bytes) and len(out) > 0
