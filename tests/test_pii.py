"""PII detection/redaction (sketchlib/text/pii.py)."""

import pytest
from pyspark.sql import functions as F

from sketchlib.text.pii import (
    PII_PATTERNS,
    pii_summary,
    redact_pii,
    with_pii_stats,
)

CASES = [
    # (text, n_email, n_phone, n_id, n_ip, redacted)
    ("write to alice.b+spam@mail.example.co.uk today",
     1, 0, 0, 0, "write to <EMAIL> today"),
    ("call +1 (212) 555-0147 or +44(303)123-4567",
     0, 2, 0, 0, "call <PHONE> or <PHONE>"),
    ("ssn 078-05-1120 on file", 0, 0, 1, 0, "ssn <ID> on file"),
    ("served from 10.0.3.77 and 192.168.0.1",
     0, 0, 0, 2, "served from <IP> and <IP>"),
    ("plain text with digits 1234 and a dash-word", 0, 0, 0, 0,
     "plain text with digits 1234 and a dash-word"),
    ("mixed: bob@x.io at 8.8.8.8, id 123-45-6789, +1 (650) 555-0000",
     1, 1, 1, 1, "mixed: <EMAIL> at <IP>, id <ID>, <PHONE>"),
]


def test_counts_and_redaction(spark):
    df = spark.createDataFrame([(i, t) for i, (t, *_) in enumerate(CASES)],
                               "i long, text string")
    out = (
        with_pii_stats(df, "text")
        .orderBy("i")
        .collect()
    )
    for row, (_, ne, np_, ni, nip, red) in zip(out, CASES):
        assert (row.n_email, row.n_phone, row.n_id, row.n_ip) == \
            (ne, np_, ni, nip), row.text
        assert row.n_pii == ne + np_ + ni + nip
        assert row.redacted_text == red, row.text


def test_redaction_removes_all_matches(spark):
    """Redacted text re-scanned for every class must count zero."""
    df = spark.createDataFrame([(t,) for t, *_ in CASES], "text string")
    red = df.select(redact_pii(F.col("text")).alias("r"))
    for name, pat, _ in PII_PATTERNS:
        leftover = red.select(
            F.sum(F.regexp_count("r", F.lit(pat))).alias("n")).first().n
        assert leftover == 0, name


def test_column_clash_raises(spark):
    df = spark.createDataFrame([("x", 1)], "text string, n_pii int")
    with pytest.raises(ValueError, match="n_pii"):
        with_pii_stats(df, "text")


def test_summary_and_plan_shape(spark):
    df = spark.createDataFrame(
        [(t, "s%d" % (i % 2)) for i, (t, *_) in enumerate(CASES)],
        "text string, source string")
    s = pii_summary(df, "text", group_col="source").orderBy("source").collect()
    assert len(s) == 2
    assert sum(r.n_docs for r in s) == len(CASES)
    assert sum(r.n_docs_with_pii for r in s) == 5
    assert sum(r.total_email for r in s) == 2
    assert sum(r.total_ip for r in s) == 3

    # map-only stats pass: no exchange in the per-doc plan
    plan = with_pii_stats(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_has_pii_single_pass_matches_counts(spark):
    from sketchlib.text.pii import has_pii

    df = spark.createDataFrame([(i, t) for i, (t, *_) in enumerate(CASES)],
                               "i long, text string")
    got = (with_pii_stats(df, "text", redact=False)
           .withColumn("flag", has_pii(F.col("text")))
           .select("i", "n_pii", "flag").orderBy("i").collect())
    for r in got:
        assert r.flag == (r.n_pii > 0), r.i
