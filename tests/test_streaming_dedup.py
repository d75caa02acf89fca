"""Streaming first-occurrence dedup (sketchlib.streaming.dedup)."""

import datetime
import os

import pytest
from pyspark.sql import types as T

from sketchlib.streaming import streaming_dedup

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def _run_pass(spark, src, ckpt, **kw):
    got = []

    def sink(batch_df, _bid):
        got.extend(batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    deduped = streaming_dedup(stream, "ts", watermark="1 hour", **kw)
    q = (deduped.writeStream.foreachBatch(sink)
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(
            "availableNow streaming pass did not finish in 120s")
    return got


def test_content_dedup_within_stream_and_across_restart(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    rows1 = [(0, "alpha beta", _ts(0)),
             (1, "gamma delta", _ts(1)),
             (2, "ALPHA   beta", _ts(2)),     # dup of 0 modulo normalization
             (3, "unique text", _ts(3))]
    spark.createDataFrame(rows1, SCHEMA).repartition(1).write.mode(
        "append").parquet(src)
    out1 = sorted(r["doc_id"] for r in _run_pass(spark, src, ckpt,
                                                 text_col="text"))
    assert out1 == [0, 1, 3]

    # restart from checkpoint: a repeat within the watermark horizon is
    # still suppressed by recovered state; a new text passes
    rows2 = [(4, "gamma delta", _ts(10)),     # dup of 1, state recovered
             (5, "fresh content", _ts(11))]
    spark.createDataFrame(rows2, SCHEMA).repartition(1).write.mode(
        "append").parquet(src)
    out2 = sorted(r["doc_id"] for r in _run_pass(spark, src, ckpt,
                                                 text_col="text"))
    assert out2 == [5]


def test_key_cols_dedup(spark, tmp_path):
    src, ckpt = str(tmp_path / "src2"), str(tmp_path / "ckpt2")
    os.makedirs(src, exist_ok=True)
    rows = [(10, "a", _ts(0)), (11, "a", _ts(5)), (12, "b", _ts(6))]
    spark.createDataFrame(rows, SCHEMA).repartition(1).write.mode(
        "append").parquet(src)
    out = sorted(r["doc_id"] for r in _run_pass(spark, src, ckpt,
                                                key_cols=["text"]))
    assert out == [10, 12]


def test_validates_key_choice(spark, tmp_path):
    src = str(tmp_path / "src3")
    os.makedirs(src, exist_ok=True)
    df = spark.readStream.schema(SCHEMA).parquet(src)
    with pytest.raises(ValueError):
        streaming_dedup(df, "ts", key_cols=["text"], text_col="text")
    with pytest.raises(ValueError):
        streaming_dedup(df, "ts")
