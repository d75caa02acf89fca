"""Domain-blocklist filtering (sketchlib/text/urls.py)."""

import pytest
from pyspark.sql import functions as F

from sketchlib.text.urls import filter_blocked_domains

URLS = [
    (0, "https://www.bad.example.org/x"),
    (1, "http://sub.bad.example.org/y"),       # same domain, different host
    (2, "https://good.example.net/z"),
    (3, "https://EVIL.com/a?q=1"),             # case-folded host
    (4, "https://fine.io/b"),
]


@pytest.fixture()
def urls_df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_domain_level_blocking(spark, urls_df):
    bl = spark.createDataFrame([("example.org",), ("evil.com",)], "d string")
    kept = filter_blocked_domains(urls_df, bl, "url")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 4]
    assert kept.columns == ["doc_id", "url"]


def test_host_level_blocking(spark, urls_df):
    # host-level blocks only the exact host (www. stripped), not siblings
    bl = spark.createDataFrame([("bad.example.org",)], "host string")
    kept = filter_blocked_domains(urls_df, bl, "url", level="host")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 3, 4]


def test_blocklist_case_and_dup_insensitive(spark, urls_df):
    bl = spark.createDataFrame(
        [("EXAMPLE.ORG",), ("example.org",)], "d string")
    kept = filter_blocked_domains(urls_df, bl, "url")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3, 4]


def test_plain_sequence_blocklist(spark, urls_df):
    """A Python list/tuple of domains works like the DataFrame form; an
    empty blocklist keeps every row (it used to die on list.columns)."""
    kept = filter_blocked_domains(urls_df, ["example.org", "EVIL.com"])
    assert sorted(r.doc_id for r in kept.collect()) == [2, 4]
    assert filter_blocked_domains(urls_df, []).count() == len(URLS)


def test_temp_column_collision_preserved(spark):
    df = spark.createDataFrame(
        [(0, "https://evil.com/a", "keepme")],
        "doc_id long, url string, __blockkey string")
    bl = spark.createDataFrame([("other.org",)], "d string")
    kept = filter_blocked_domains(df, bl, "url")
    assert kept.columns == ["doc_id", "url", "__blockkey"]
    assert kept.first()["__blockkey"] == "keepme"


def test_bad_level_raises(spark, urls_df):
    with pytest.raises(ValueError, match="level"):
        filter_blocked_domains(urls_df, urls_df.select("url"), "url",
                               level="path")


def test_plan_is_broadcast_anti_join(spark, urls_df):
    bl = spark.createDataFrame([("evil.com",)], "d string")
    kept = filter_blocked_domains(urls_df, bl, "url")
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the only shuffle is the blocklist-side distinct() (tiny, pre-broadcast);
    # the corpus side is never exchanged
    shuffles = [l for l in plan.splitlines()
                if "Exchange" in l and "broadcast" not in l.lower()]
    assert all("__blockkey" in l for l in shuffles), shuffles
    assert len(shuffles) <= 1, shuffles
