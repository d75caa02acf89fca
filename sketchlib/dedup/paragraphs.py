"""Paragraph-level exact deduplication (the Dolma / RefinedWeb recipe:
dedup at paragraph granularity, keep the first occurrence corpus-wide,
reassemble documents from their surviving paragraphs).

Soldaini et al. 2024 ("Dolma") and Penedo et al. 2023 ("The RefinedWeb
Dataset") both dedup paragraphs — newline-delimited blocks — exactly,
because boilerplate (cookie banners, nav footers, license blurbs) repeats
across MILLIONS of pages while full-document dedup misses it.  Rule: a
paragraph survives only in the lexicographically-first (id, position)
document that contains it; a document's output text is its surviving
paragraphs joined in original order; documents with no surviving
paragraph drop out.

``sep`` is a LITERAL delimiter (it is regex-escaped before the split and
used verbatim for the re-join), so ``sep="|"`` or ``sep="..."`` behave as
a user expects rather than as accidental regexes.

Scale shape (100 TB): the winner per distinct paragraph is computed with a
partial-aggregable ``groupBy(fingerprint).agg(min(struct(id, pos)))`` —
map-side combine collapses a million-fold repeated boilerplate paragraph
to one row per input partition BEFORE the shuffle, so the hottest key in
the corpus (exactly what this operator exists for) costs one narrow row
per partition, not a shuffle hot spot.  The paragraph text itself is never
shuffled by the skewed fingerprint for the winner computation; it moves
through exactly two shuffles — the (fingerprint, id, pos) equi-join that
selects survivors (AQE splits any residual probe-side skew) and the final
reassembly by document id.  A window over ``partitionBy(fingerprint)``
would instead sort ALL copies of the hot paragraph in one task.

The fingerprint is 128-bit (two independent xxhash64 lanes, the second
over a domain-separated stream), NOT a single 64-bit hash: at the
operator's stated 10^10–10^11-paragraph scale the 64-bit birthday bound
expects dozens of collisions, and a collision here doesn't just merge two
counts — it DELETES a unique paragraph corpus-wide (the colliding text
loses the winner join everywhere, including its own first occurrence).
At 128 bits the expected collision count at 10^11 paragraphs is ~1.5e-17.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_paragraphs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       sep: str = "\n\n") -> DataFrame:
    """(id, pos, para) — one row per non-blank paragraph, position in the
    original document preserved (0-based index among ALL split blocks, so
    surviving paragraphs re-join in original relative order).  Non-blank
    means "contains a non-whitespace character": Spark's ``trim`` strips
    only ASCII spaces, which would let newline/tab-only blocks through as
    paragraphs."""
    parts = F.posexplode(F.split(F.col(text_col), re.escape(sep)))
    out = (df.where(F.col(text_col).isNotNull())
           .select(F.col(id_col), parts.alias("pos", "para")))
    return out.where(F.col("para").rlike(r"\S"))


def _with_fingerprint(paras: DataFrame) -> DataFrame:
    """Adds the 128-bit paragraph fingerprint as two u64 columns.  The
    second lane prepends a literal discriminator so the two lanes are
    hashes of DIFFERENT streams (xxhash64 folds multiple arguments
    sequentially), i.e. independent up to xxhash64's mixing."""
    return paras.withColumn("fp1", F.xxhash64("para")).withColumn(
        "fp2", F.xxhash64(F.lit("sketchlib.para.lane2"), F.col("para")))


def dedup_paragraphs(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", sep: str = "\n\n") -> DataFrame:
    """``(id_col, text_col)`` — each document rebuilt from the paragraphs
    for which it is the corpus-wide first occurrence (min (id, pos) per
    distinct paragraph).  Documents whose every paragraph appeared earlier
    somewhere else are dropped; callers wanting their ids anti-join the
    result against the input."""
    paras = _with_fingerprint(
        explode_paragraphs(df, text_col, id_col, sep))
    winners = (paras.select("fp1", "fp2", id_col, "pos")
               .groupBy("fp1", "fp2")
               .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w"))
               .select("fp1", "fp2", F.col(f"w.{id_col}").alias(id_col),
                       F.col("w.pos").alias("pos")))
    kept = (paras.join(winners, on=["fp1", "fp2", id_col, "pos"])
            .select(id_col, "pos", "para"))
    return (kept.groupBy(id_col)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"]),
                sep).alias(text_col)))


def paragraph_dedup_summary(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            sep: str = "\n\n") -> DataFrame:
    """One-row audit ``(n_paragraphs, n_distinct_paragraphs, n_docs_out)``
    in two narrow aggregates — the counts a dedup run reports without
    materializing the rebuilt corpus."""
    paras = _with_fingerprint(explode_paragraphs(df, text_col, id_col, sep))
    by_fp = paras.groupBy("fp1", "fp2").agg(
        F.count("*").alias("c"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w"))
    # coalesce(sum, 0): an empty corpus audits as 0 paragraphs, not NULL
    return by_fp.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_paragraphs"),
        F.count("*").alias("n_distinct_paragraphs"),
        F.count_distinct(F.col(f"w.{id_col}")).alias("n_docs_out"))
