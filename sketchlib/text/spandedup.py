"""Exact-substring span deduplication (ExactSubstr, token-level).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499) remove every text span whose content appears
verbatim elsewhere in the corpus — their ExactSubstr tool builds one
monolithic suffix array over the concatenated corpus and scans it for
repeated substrings of >= 50 tokens.  A single global suffix array does
not distribute; the standard scale-out reformulation (used by most open
reproductions) is gram-fingerprint based and maps onto Spark directly:

* a token position ``p`` of a document starts a **duplicated gram** if
  the ``n``-token gram at ``p`` occurs at least ``min_count`` times in
  the corpus (all occurrences count, including repeats within the same
  document — self-repetition is deduplicated too, as in the paper);
* per document, flagged positions are merged into **maximal spans**
  (each flagged gram covers ``[p, p+n-1]``; overlapping/adjacent covers
  merge), exactly the span structure the suffix-array scan yields for
  repeats of length >= n;
* the cleaned document drops every covered token (ExactSubstr removes
  ALL copies of a duplicated span, not all-but-one — so does this).

Spark-first shape (everything JVM-side; no Python anywhere):

* **Gram derivation** reuses :mod:`sketchlib.text.decontaminate`'s
  tokenizer + token-hash gram machinery (tokens xxhash64'd once, grams
  hashed from token-hash tuples inside whole-stage codegen);
  ``posexplode`` emits narrow ``(gram, doc, pos)`` rows.
* **Counting** is one ``groupBy(gram).count()`` shuffle — map-side
  partial aggregation collapses hot grams (a boilerplate gram occurring
  10^9 times arrives at its reducer as one partial per map task, not
  10^9 rows).
* **Flagging** joins the occurrences against the ``count >= min_count``
  gram keys — a shuffle join on the gram hash; a pathologically hot
  gram is split by AQE's skew-join handling rather than pinning one
  reducer (the window-function formulation would).
* **Span merge + token removal** are pure array expressions over the
  per-doc sorted position list (bounded by document length): interval
  starts via a gap filter, span ends via the next start, covered-token
  removal via an ``exists`` probe per token.

Cost at scale: two shuffles of O(corpus tokens) narrow rows — the same
asymptotics as the suffix-array construction itself, but embarrassingly
parallel and restartable.  The gram hash domain is shared with
:func:`sketchlib.text.decontaminate.ngram_hashes_from_tokens`; a
cross-gram collision needs an xxhash64 collision (2^-64 per pair).
Documents shorter than ``n`` tokens produce no grams (their duplication
is exact-dedup's job — :mod:`sketchlib.dedup.exact`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontaminate import ngram_hashes_from_tokens, tokens_col


def duplicate_gram_positions(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", n: int = 13,
                             min_count: int = 2) -> DataFrame:
    """``(id_col, pos)`` rows: every 0-based token position starting an
    ``n``-gram that occurs >= ``min_count`` times corpus-wide."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    tcol, gcol = "__sd_toks", "__sd_grams"
    grams = (df.select(id_col, tokens_col(F.col(text_col)).alias(tcol))
             .select(id_col, F.when(
                 F.size(F.col(tcol)) >= n,
                 ngram_hashes_from_tokens(F.col(tcol), n))
                 .otherwise(F.array().cast("array<long>")).alias(gcol))
             .select(id_col, F.posexplode(gcol).alias("pos", "g")))
    dup_keys = (grams.groupBy("g")
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") >= min_count)
                .select("g"))
    return grams.join(dup_keys, "g").select(id_col, "pos")


def remove_duplicate_spans(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 13,
                           min_count: int = 2) -> DataFrame:
    """Per-document span-dedup profile + cleaned text.

    Output: ``id_col``, every input column except ``text_col``, plus
    ``n_tokens`` (whitespace tokens), ``n_dup_grams`` (flagged gram
    starts), ``n_spans`` (maximal merged spans), ``dup_tokens`` (tokens
    covered by any span), and ``clean_text`` (the document with covered
    tokens removed, single-space joined — whitespace-normalized, the
    tokenizer's contract).  Deterministic and partition-independent:
    every decision derives from corpus-global gram counts."""
    clash = sorted({"__ps", "__toks", "__sidx", "__spans"} & set(df.columns))
    if clash:
        raise ValueError(f"input already has internal column(s) {clash}; "
                         "rename them before calling remove_duplicate_spans")
    flagged = duplicate_gram_positions(df, text_col, id_col, n, min_count)
    per_doc = flagged.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("__ps"))

    # NULL text coalesces to zero tokens (F.size(NULL) is -1 under legacy
    # sizeOfNull, which would corrupt span_dedup_summary's token totals):
    # such a doc comes out n_tokens = 0, clean_text = "" — same policy as
    # boilerplate.py / lmscore.py / dsir.py
    out = (df.join(per_doc, id_col, "left")
           .withColumn("__ps", F.coalesce(
               F.col("__ps"), F.array().cast("array<int>")))
           .withColumn("__toks", F.coalesce(
               tokens_col(F.col(text_col)),
               F.array().cast("array<string>"))))
    # maximal spans from sorted equal-length interval starts: a new span
    # begins where the gap to the previous start exceeds the gram length
    # sequence(1, 0) would generate a DESCENDING [1, 0] (and element_at
    # index 0 errors under ANSI), so the empty case is guarded explicitly
    out = out.withColumn("__sidx", F.expr(
        f"filter(CASE WHEN size(__ps) = 0 THEN array() "
        f"ELSE sequence(1, size(__ps)) END, i -> i = 1 OR "
        f"element_at(__ps, i) - element_at(__ps, i - 1) > {n})"))
    out = out.withColumn("__spans", F.expr(
        f"transform(CASE WHEN size(__sidx) = 0 THEN array() "
        f"ELSE sequence(1, size(__sidx)) END, k -> named_struct("
        f"'s', element_at(__ps, element_at(__sidx, k)), "
        f"'e', element_at(__ps, CASE WHEN k < size(__sidx) "
        f"THEN element_at(__sidx, k + 1) - 1 ELSE size(__ps) END) "
        f"+ {n} - 1))"))
    out = (out
           .withColumn("n_tokens", F.size("__toks").cast("long"))
           .withColumn("n_dup_grams", F.size("__ps").cast("long"))
           .withColumn("n_spans", F.size("__spans").cast("long"))
           .withColumn("dup_tokens", F.expr(
               "aggregate(__spans, 0L, (acc, sp) -> "
               "acc + sp.e - sp.s + 1)"))
           .withColumn("clean_text", F.expr(
               "array_join(filter(__toks, (t, i) -> NOT exists(__spans, "
               "sp -> i >= sp.s AND i <= sp.e)), ' ')")))
    return out.drop("__ps", "__toks", "__sidx", "__spans", text_col)


def span_dedup_summary(profiled: DataFrame) -> DataFrame:
    """Corpus roll-up of :func:`remove_duplicate_spans` output: document
    and token totals plus duplicated-token mass."""
    return profiled.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_spans") > 0, 1).otherwise(0))
        .alias("docs_with_dups"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("dup_tokens").alias("dup_tokens"),
        (F.sum("dup_tokens") / F.sum("n_tokens")).alias("dup_frac"))
