"""Benchmark decontamination: flag and drop corpus documents that overlap an
evaluation set by shared word n-grams.

The published method (GPT-3, Brown et al. 2020, appendix C; likewise PaLM
and Llama data notes): a training document is contaminated if it shares any
normalized 13-gram with the eval set.  Spark-first shape:

* n-grams, normalization, and hashing are pure JVM column expressions
  (``split`` → ``transform(sequence(...))`` → ``xxhash64`` inside
  whole-stage codegen) — no Python anywhere;
* the eval side is tiny (benchmark suites are MBs), so its distinct gram
  hashes ship as a **broadcast** hash join — the corpus is scanned once,
  never shuffled; only matching (doc, gram) rows (a vanishing fraction)
  reach the per-doc aggregation;
* gram hashes are 64-bit — a corpus×eval false-flag needs an xxhash64
  collision (~(corpus_grams x eval_grams)/2^64; immaterial at 100 TB).

Documents shorter than ``n`` tokens fall back to a whole-text gram
(mirroring :func:`sketchlib.dedup.minhash.shingles_col`) so short docs are
still comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: Column | str) -> Column:
    """Normalized word tokens: lowercase, whitespace-split."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(F.trim(col)), r"\s+")


def ngram_hashes_from_tokens(t: Column, n: int = 13) -> Column:
    """``array<long>`` of 64-bit hashes over a *materialized* token-array
    column's ``n``-grams; whole-text fallback below ``n`` tokens.

    Hot-path formulation (and the ONE normative gram-hash domain of this
    module — :func:`contamination_report` uses this same function
    internally, so grams precomputed with the public API join against its
    internals): every token string is xxhash64'd exactly once into an
    int64 array (a long 13-gram would otherwise re-hash each token string
    up to 13 times), then each gram is ``xxhash64`` of its n token
    *hashes*.  A cross-token hash collision merging two different grams
    needs an xxhash64 collision (2^-64 per distinct-token pair) — far
    below the doc-level flagging noise floor.  Token-tuple equality ==
    joined-string equality because tokens contain no whitespace.

    ``t`` MUST be a bound column (``.withColumn``/``select`` the token
    array first): Catalyst does not eliminate common subexpressions inside
    higher-order-function lambdas, so an inline ``split`` here would be
    re-evaluated for every element access — measured 30x slower.  The
    token-hash array itself is let-bound through a one-element transform
    for the same reason."""
    def build(th: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(th) - (n - 1)),
            lambda i: F.xxhash64(*[F.element_at(th, i + k) for k in range(n)]))
        whole = F.array(F.xxhash64(F.array_join(t, " ")))
        return F.when(F.size(th) >= n, grams).otherwise(whole)

    token_hashes = F.transform(t, lambda x: F.xxhash64(x))
    return F.transform(F.array(token_hashes), build)[0]


def ngram_hash_col(text_col: Column | str, n: int = 13) -> Column:
    """Convenience inline form (tokenize + gram-hash in one expression).
    Fine for tests/small data; hot paths should materialize
    :func:`tokens_col` first and use :func:`ngram_hashes_from_tokens` —
    see that docstring for the subexpression-elimination trap."""
    return ngram_hashes_from_tokens(tokens_col(text_col), n)


def _gram_rows(df: DataFrame, text_col: str, n: int, extra_cols: list):
    """(extra_cols..., __g) — one row per distinct gram hash per doc,
    in the module's one normative gram-hash domain
    (:func:`ngram_hashes_from_tokens`)."""
    base = (df.filter(F.col(text_col).isNotNull())
            .select(*extra_cols, tokens_col(text_col).alias("__t")))
    grams = ngram_hashes_from_tokens(F.col("__t"), n)
    return base.select(
        *extra_cols, F.explode(F.array_distinct(grams)).alias("__g"))


def contamination_report(corpus: DataFrame, eval_df: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         eval_text_col: str | None = None,
                         n: int = 13) -> DataFrame:
    """Per contaminated corpus document: ``(id_col, n_hits)`` where
    ``n_hits`` is the number of the doc's DISTINCT n-grams that appear
    anywhere in the eval set.  Clean documents do not appear."""
    etc = eval_text_col or text_col
    eval_grams = _gram_rows(eval_df, etc, n, []).distinct()
    doc_grams = _gram_rows(corpus, text_col, n, [id_col])
    return (doc_grams.join(F.broadcast(eval_grams), "__g")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hits")))


def decontaminate(corpus: DataFrame, eval_df: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str | None = None,
                  n: int = 13) -> DataFrame:
    """Corpus minus every document sharing at least one ``n``-gram with the
    eval set (left-anti join against the contamination report)."""
    hits = contamination_report(corpus, eval_df, text_col, id_col,
                                eval_text_col, n)
    return corpus.join(hits.select(id_col), id_col, "left_anti")
