"""Sequence packing (sketchlib/packing.py)."""

import pytest
from pyspark.sql import functions as F

from sketchlib.packing import pack_sequences, packing_summary


@pytest.fixture()
def docs_df(spark):
    # (doc_id, n_tokens)
    rows = [(i, 10 * (i % 7) + 3) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_explicit_bucket_order_matches_python(spark, docs_df):
    out = pack_sequences(docs_df.withColumn("b", (F.col("doc_id") % 4)
                                            .cast("int")),
                         "n_tokens", budget=64, bucket_col="b",
                         order_col="doc_id").collect()
    # python replay: per bucket, docs in doc_id order, running offset
    offsets = {}
    expect = {}
    for doc_id, t in sorted((r.doc_id, r.n_tokens) for r in out):
        b = doc_id % 4
        s = offsets.get(b, 0)
        first = s // 64
        last = (s + t - 1) // 64 if t > 0 else first
        expect[doc_id] = (b, s, first, last)
        offsets[b] = s + t
    for r in out:
        assert (r.bucket, r.start_offset, r.first_seq, r.last_seq) == \
            expect[r.doc_id], r.doc_id


def test_hash_mode_partition_independent(spark, docs_df):
    a = sorted(map(tuple, pack_sequences(docs_df.repartition(1),
                                         "n_tokens", 128).collect()))
    b = sorted(map(tuple, pack_sequences(docs_df.repartition(7),
                                         "n_tokens", 128).collect()))
    assert a == b


def test_streams_are_gapless(spark, docs_df):
    """Within each bucket, offsets tile the token stream exactly."""
    out = pack_sequences(docs_df, "n_tokens", 64, n_buckets=8)
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(by_bucket) > 1
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r.start_offset)
        pos = 0
        for r in rs:
            assert r.start_offset == pos
            pos += r.n_tokens


def test_zero_token_and_straddle(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 100)], "doc_id long, n_tokens long")
    out = {r.doc_id: r for r in
           pack_sequences(df.withColumn("b", F.lit(0)), "n_tokens", 32,
                          bucket_col="b", order_col="doc_id").collect()}
    assert (out[0].first_seq, out[0].last_seq) == (0, 0)
    assert (out[1].first_seq, out[1].last_seq) == (0, 0)  # zero-token doc
    # doc 2: offset 10, ends at 109 -> straddles seqs 0..3
    assert (out[2].first_seq, out[2].last_seq) == (0, 3)


def test_summary_fill(spark):
    df = spark.createDataFrame(
        [(i, 50) for i in range(8)], "doc_id long, n_tokens long")
    s = packing_summary(
        pack_sequences(df.withColumn("b", F.lit(0)), "n_tokens", 100,
                       bucket_col="b", order_col="doc_id"),
        "n_tokens", 100).first()
    assert (s.n_docs, s.n_tokens, s.n_seqs) == (8, 400, 4)
    assert s.fill_ratio == 1.0


def test_validation(spark, docs_df):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs_df, "n_tokens", 0)
    with pytest.raises(ValueError, match="column"):
        pack_sequences(docs_df.withColumn("bucket", F.lit(1)),
                       "n_tokens", 10)


def test_single_shuffle_plan(spark, docs_df):
    plan = (pack_sequences(docs_df, "n_tokens", 128)
            ._jdf.queryExecution().executedPlan().toString())
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Python" not in plan and "MapIn" not in plan


def test_summary_boundary_empty_doc_no_phantom_seq(spark):
    """A zero-token doc whose offset lands exactly on a budget boundary at
    the end of a bucket must not open a phantom sequence."""
    from sketchlib.packing import pack_sequences, packing_summary

    rows = [(1, 100), (2, 100), (3, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long") \
        .withColumn("b", F.lit(0))
    packed = pack_sequences(df, "n_tokens", budget=100,
                            bucket_col="b", order_col="doc_id")
    [s] = packing_summary(packed, "n_tokens", budget=100).collect()
    assert s["n_seqs"] == 2 and s["fill_ratio"] == 1.0
    # all-empty bucket: zero sequences, NULL fill ratio
    empty = spark.createDataFrame([(9, 0)], "doc_id long, n_tokens long") \
        .withColumn("b", F.lit(0))
    [e] = packing_summary(
        pack_sequences(empty, "n_tokens", budget=100,
                       bucket_col="b", order_col="doc_id"),
        "n_tokens", budget=100).collect()
    assert e["n_seqs"] == 0 and e["fill_ratio"] is None


def test_pack_null_tokens_zero_negative_raises(spark):
    import pytest

    from sketchlib.packing import pack_sequences

    df = spark.createDataFrame([(1, 50), (2, None), (3, 30)],
                               "doc_id long, n_tokens long") \
        .withColumn("b", F.lit(0))
    got = {r["doc_id"]: r for r in
           pack_sequences(df, "n_tokens", budget=100, bucket_col="b",
                          order_col="doc_id").collect()}
    # NULL packs as a zero-token doc; offsets stay consistent
    assert got[2]["start_offset"] == 50 and got[3]["start_offset"] == 50
    bad = spark.createDataFrame([(1, 50), (2, -7)],
                                "doc_id long, n_tokens long") \
        .withColumn("b", F.lit(0))
    with pytest.raises(Exception, match="negative n_tokens"):
        pack_sequences(bad, "n_tokens", budget=100, bucket_col="b",
                       order_col="doc_id").collect()
