"""Deterministic Common-Crawl-style ``pages`` table.

Schema per ``BASELINE.json.input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``
plus derived partition keys ``lang`` / ``day = to_date(warc_ts)``.

Generation is fully deterministic (seeded, counter-based — FIXTURES.md §1):

* ``lang``  — Zipf-skewed over ten languages (en >> rest) to exercise salting;
* ``url``   — ``https://h{host}.example.{tld}/{path}`` with Zipf-skewed hosts
  and a ~20% duplicate-url rate, so distinct != count;
* ``warc_ts`` — fixed epoch 2026-01-01T00:00:00Z + row-derived offset across
  ``n_days`` consecutive UTC days;
* ``text``  — seeded token sequence with long-tailed lengths, including
  multi-byte UTF-8 tokens (exercises the encoding paths + quantile sketches);
* ``html``  — ``wrap_html(text)``, a *frozen pure function*; extraction must
  invert it byte-identically (north-rule per-row invariant).

The writer targets partitioned Parquet (``lang={}/day={}`` directories, so
Catalyst partition-prunes per-(lang, day) queries).  An Iceberg catalog could
consume the same layout; no Iceberg runtime jar ships with this sandbox's
PySpark (SURVEY.md §7 Phase 0), so Parquet is the tested path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

EXTRACTION_VERSION = 1

LANGS = ["en", "zh", "es", "de", "fr", "ja", "pt", "ru", "it", "nl"]
_TLDS = ["com", "org", "net", "io", "dev"]

_EPOCH = np.datetime64("2026-01-01T00:00:00", "us")

_HTML_PREFIX_1 = b'<!DOCTYPE html><html><head><meta charset="utf-8"><title>'
_HTML_PREFIX_2 = b"</title></head><body><article>"
_HTML_SUFFIX = b"</article></body></html>"

# vocabulary with multi-byte UTF-8 tokens; none contains '<' or '>'
_VOCAB = (
    [f"word{i}" for i in range(400)]
    + [f"término{i}" for i in range(100)]
    + [f"日本語{i}" for i in range(50)]
    + [f"中文词{i}" for i in range(50)]
    + [f"слово{i}" for i in range(50)]
    + ["the", "a", "of", "and", "to", "in", "is", "it", "that", "was"] * 5
)


def wrap_html(text: str, title: str) -> bytes:
    """Frozen v1 wrapper: html = prefix + title + marker + utf8(text) + suffix.

    ``extract_text_*`` must invert this byte-identically; bump
    EXTRACTION_VERSION on any change."""
    return (_HTML_PREFIX_1 + title.encode("utf-8") + _HTML_PREFIX_2
            + text.encode("utf-8") + _HTML_SUFFIX)


def extract_text_py(html: bytes) -> str:
    """Reference extraction (pure function of bytes): the byte span between
    the <article> markers, decoded as UTF-8."""
    start = html.index(_HTML_PREFIX_2) + len(_HTML_PREFIX_2)
    end = html.rindex(_HTML_SUFFIX)
    return html[start:end].decode("utf-8")


def extract_text_expr(html_col):
    """Spark-native (JVM, whole-stage-codegen) extraction — equivalent to
    :func:`extract_text_py` for valid UTF-8 html payloads."""
    from pyspark.sql import functions as F

    s = html_col.cast("string")
    return F.regexp_extract(s, r"(?s)<article>(.*)</article>", 1)


def generate_pages(n_rows: int, seed: int = 42, n_days: int = 7,
                   n_hosts: int = 1000, duplicate_rate: float = 0.2,
                   mean_tokens: float = 40.0) -> pd.DataFrame:
    """Deterministic pages table as a pandas DataFrame (column order:
    url, warc_ts, html, text, lang)."""
    rng = np.random.default_rng(seed)

    # lang: Zipf over LANGS (s ~ 1.2)
    ranks = np.arange(1, len(LANGS) + 1, dtype=np.float64)
    lang_p = ranks ** -1.2
    lang_p /= lang_p.sum()
    lang_idx = rng.choice(len(LANGS), size=n_rows, p=lang_p)

    # hosts: Zipf over n_hosts
    hranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    host_p = hranks ** -1.2
    host_p /= host_p.sum()
    host_idx = rng.choice(n_hosts, size=n_rows, p=host_p)
    tld_idx = host_idx % len(_TLDS)

    # duplicate urls: ~duplicate_rate of rows reuse another row's url
    base_path = np.arange(n_rows, dtype=np.int64)
    dup = rng.random(n_rows) < duplicate_rate
    src = rng.integers(0, n_rows, size=n_rows)
    url_row = np.where(dup, src, base_path)

    # timestamps: spread across n_days via a multiplicative hash of row id
    offset_us = ((base_path * 2654435761) % (n_days * 86_400)) * 1_000_000
    warc_ts = _EPOCH + offset_us.astype("timedelta64[us]")

    # text: long-tailed token counts (lognormal), tokens drawn from _VOCAB
    tok_counts = np.minimum(
        rng.lognormal(mean=np.log(mean_tokens), sigma=1.0, size=n_rows), 5000
    ).astype(np.int64) + 1
    total = int(tok_counts.sum())
    tok_ids = rng.integers(0, len(_VOCAB), size=total)
    vocab = np.asarray(_VOCAB, dtype=object)
    flat_tokens = vocab[tok_ids]
    bounds = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(tok_counts, out=bounds[1:])
    texts = [" ".join(flat_tokens[bounds[i]:bounds[i + 1]]) for i in range(n_rows)]

    hosts = np.char.add(np.char.add("h", host_idx.astype("U8")), ".example.")
    tlds = np.asarray(_TLDS, dtype="U4")[tld_idx]
    urls_own = [f"https://{h}{t}/p/{i}" for h, t, i in
                zip(hosts.tolist(), tlds.tolist(), base_path.tolist())]
    urls_own = np.asarray(urls_own, dtype=object)
    urls = urls_own[url_row]

    langs = np.asarray(LANGS, dtype=object)[lang_idx]
    htmls = [wrap_html(t, f"t{i}") for i, t in enumerate(texts)]

    return pd.DataFrame({
        "url": urls,
        "warc_ts": pd.Series(warc_ts),
        "html": htmls,
        "text": texts,
        "lang": langs,
    })


def write_pages_parquet(out_dir: str, n_rows: int, seed: int = 42,
                        n_days: int = 7, rows_per_chunk: int = 500_000,
                        **kw) -> str:
    """Write the pages table as lang/day-partitioned Parquet (idempotent:
    skips if the marker file for the same spec already exists)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # marker keyed on EVERY generation parameter: a rows_per_chunk or
    # **kw change must not silently return a differently-generated
    # fixture as if it matched
    spec = "_".join(str(x) for x in
                    (n_rows, seed, n_days, rows_per_chunk,
                     *(f"{k}={kw[k]}" for k in sorted(kw))))
    marker = os.path.join(out_dir, f"_GENERATED_{spec}")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        # no (matching) marker but the dir exists: a crashed or
        # differently-parameterized previous run — write_to_dataset
        # APPENDS uuid-named files, so regenerating on top would
        # duplicate rows; start clean instead.  ONLY if the directory is
        # recognizably ours, though: every entry must be a _GENERATED_*
        # marker (any spec format, including pre-r5 ones) or a lang=...
        # partition dir this function writes.  A mistyped path to real
        # data must raise, not be silently deleted wholesale.
        entries = os.listdir(out_dir)
        foreign = [e for e in entries
                   if not (e.startswith("_GENERATED_")
                           or (e.startswith("lang=")
                               and os.path.isdir(os.path.join(out_dir, e))))]
        if foreign:
            raise ValueError(
                f"refusing to regenerate into {out_dir!r}: it has no marker "
                f"for this spec and contains entries this writer did not "
                f"create ({foreign[:5]!r}{'...' if len(foreign) > 5 else ''}); "
                "delete it explicitly if regeneration is intended")
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    chunk_id = 0
    while written < n_rows:
        n = min(rows_per_chunk, n_rows - written)
        pdf = generate_pages(n, seed=seed + chunk_id, n_days=n_days, **kw)
        pdf["day"] = pdf["warc_ts"].dt.strftime("%Y-%m-%d")
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_to_dataset(table, root_path=out_dir, partition_cols=["lang", "day"])
        written += n
        chunk_id += 1
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
