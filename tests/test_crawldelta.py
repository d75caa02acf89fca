"""Crawl-snapshot delta (sketchlib/data/crawldelta.py): status
classification, latest-capture dedup, null handling, summary zero-fill."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from sketchlib.data.crawldelta import STATUSES, crawl_delta, delta_summary


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, text string, warc_ts timestamp")


TS = datetime.datetime(2026, 1, 1)
TS2 = datetime.datetime(2026, 2, 1)


def test_statuses(spark):
    old = _df(spark, [("u1", "same", TS), ("u2", "before", TS),
                      ("u3", "gone", TS), (None, "dropped", TS)])
    new = _df(spark, [("u1", "same", TS2), ("u2", "after", TS2),
                      ("u4", "fresh", TS2)])
    got = {r["url"]: r["status"]
           for r in crawl_delta(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed", "u3": "removed",
                   "u4": "added"}


def test_latest_capture_wins(spark):
    # u1 captured twice in new: with ts_col the later text counts
    old = _df(spark, [("u1", "v1", TS)])
    new = _df(spark, [("u1", "v1", TS), ("u1", "v2", TS2)])
    [r] = crawl_delta(old, new, ts_col="warc_ts").collect()
    assert r["status"] == "changed"
    # without ts_col: deterministic min-fingerprint winner on both sides
    a = crawl_delta(old, new).collect()
    b = crawl_delta(old, new).collect()
    assert a == b


def test_null_text_null_safe(spark):
    old = _df(spark, [("u1", None, TS)])
    new = _df(spark, [("u1", None, TS2), ("u2", None, TS2)])
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "added"}


def test_custom_fingerprint_and_summary(spark):
    old = _df(spark, [("u1", "A", TS), ("u2", "x", TS)])
    new = _df(spark, [("u1", "a", TS2), ("u2", "y", TS2)])
    # case-insensitive content identity: u1 unchanged, u2 changed
    d = crawl_delta(old, new, fingerprint=F.xxhash64(F.lower("text")))
    got = {r["url"]: r["status"] for r in d.collect()}
    assert got == {"u1": "unchanged", "u2": "changed"}
    s = {r["status"]: r["n_keys"] for r in delta_summary(d).collect()}
    assert s == {"added": 0, "removed": 0, "changed": 1, "unchanged": 1}
    assert set(s) == set(STATUSES)


def test_randomized_vs_spark_sql(spark):
    """Seeded random snapshots: crawl_delta matches a plain full-outer
    reference computed with vanilla Spark ops, across 5 shapes with
    duplicate keys resolved by latest capture."""
    import random

    rng = random.Random(77)
    for trial in range(5):
        n_old = rng.randrange(20, 80)
        n_new = rng.randrange(20, 80)
        keys = rng.randrange(10, 40)

        def rows(n):
            return [(f"u{rng.randrange(keys)}",
                     rng.choice(["a", "b", "c", None]),
                     datetime.datetime(2026, 1, 1 + rng.randrange(20)))
                    for _ in range(n)]

        old, new = _df(spark, rows(n_old)), _df(spark, rows(n_new))
        got = {r["url"]: r["status"]
               for r in crawl_delta(old, new, ts_col="warc_ts").collect()}

        def latest(df):
            w = (df.groupBy("url")
                 .agg(F.max(F.struct(F.col("warc_ts").alias("ts"),
                                     F.xxhash64("text").alias("fp")))
                      .alias("w")))
            return {r["url"]: r["w"]["fp"] for r in w.collect()}

        lo, ln = latest(old), latest(new)
        want = {}
        for u in set(lo) | set(ln):
            if u not in lo:
                want[u] = "added"
            elif u not in ln:
                want[u] = "removed"
            else:
                want[u] = "unchanged" if lo[u] == ln[u] else "changed"
        assert got == want, trial
