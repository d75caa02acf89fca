"""End-to-end training-data corpus cleaning, composed from sketchlib ops.

Usage (spark-submit --py-files sketchlib.zip sketchlib/jobs/corpus_job.py):

    python -m sketchlib.jobs.corpus_job \
        --input /data/documents --output /out/manifest \
        [--min-quality 3] [--jaccard 0.8] [--no-near-dup]

One job, the standard LLM-corpus shape:

1. **annotate** — lang-id, 0-10 quality bucket, token/char counts — all
   JVM column expressions (whole-stage codegen, zero Python);
2. **exact dedup** — normalized-text fingerprint, lowest doc_id wins
   (8-byte key + id shuffle, text never shuffles);
3. **near dedup** — MinHash+LSH banding with exact Jaccard verification;
   of each surviving pair the higher doc_id is dropped;
4. **quality filter** — docs below ``--min-quality`` are dropped;
5. **manifest** — one row per input doc: ``(doc_id, keep, drop_reason,
   pred_lang, quality, n_chars, n_bpe_tokens)``; a kept doc has
   ``drop_reason = NULL``.  The manifest is a *decision log*, not a copy
   of the corpus: at 100 TB you join it back to the documents table to
   materialize the cleaned split, and every drop is attributable.

Optional scrub stages (``--blocklist``, ``--max-pii``,
``--min-mean-logp-milli``) add the domain-blocklist, PII-prevalence, and
unigram-LM-tail drop rules from ``sketchlib.text``.

Drop precedence (first match wins): blocked_domain > exact_dup >
near_dup > low_quality > pii_heavy > lm_tail — an exact duplicate reports
exact_dup even if also low quality, so rate accounting stays disjoint.
Blocked docs are excluded from dedup survivorship (a blocked doc must not
be the reason its non-blocked copies are dropped).

The printed JSON summary carries disjoint drop counts plus an HLL distinct
fingerprint estimate (corpus diversity) and total kept BPE tokens.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def annotate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    from sketchlib.text.analysis import (bpe_token_count, lang_id,
                                         quality_bucket)

    c = F.col(text_col)
    return docs.withColumns({
        "pred_lang": lang_id(c),
        "quality": quality_bucket(c),
        "n_chars": F.length(c).cast("long"),
        "n_bpe_tokens": bpe_token_count(c).cast("long"),
    })


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", min_quality: int = 3,
                 near_dup: bool = True, jaccard: float = 0.8,
                 blocklist: DataFrame | None = None, url_col: str = "url",
                 max_pii: int | None = None,
                 c4_rules: bool = False,
                 min_mean_logp_milli: int | None = None,
                 lm_vocab_size: int = 50_000,
                 persist_level: str | None = None,
                 minhash_method: str = "perm") -> DataFrame:
    """Manifest DataFrame: (id, keep, drop_reason, pred_lang, quality,
    n_chars, n_bpe_tokens) — one row per input doc.

    Optional scrub stages (all off by default, each adds one disjoint
    drop reason):

    * ``blocklist`` — a one-column domain DataFrame; docs whose
      ``url_col`` registrable domain matches are dropped as
      ``blocked_domain`` (broadcast semi-join flag, corpus never
      shuffled).  Highest precedence: a blocked doc reports
      ``blocked_domain`` even if it is also a duplicate.
    * ``max_pii`` — docs with more than this many PII spans
      (:func:`sketchlib.text.pii.pii_counts`) drop as ``pii_heavy``
      (JVM regexp counts, map-only).
    * ``min_mean_logp_milli`` — docs whose mean token log-prob under a
      corpus-trained unigram LM (:mod:`sketchlib.text.lmscore`, integer
      milli-nats) falls below the threshold drop as ``lm_tail``.
    * ``c4_rules`` — docs failing the C4 page verdict
      (:mod:`sketchlib.text.c4`, Raffel et al. 2020 §2.2: <3 sentences
      after line filtering, lorem ipsum, brace, bad word) drop as
      ``c4_filtered`` (map-only flag, whole-stage codegen).  Note this
      flags on the PAGE rules; to also strip the failing LINES, run
      :func:`sketchlib.text.c4.c4_filter` as a pre-clean transform
      (likewise :func:`sketchlib.dedup.paragraphs.dedup_paragraphs` for
      paragraph-level dedup — both rewrite text, which a manifest cannot
      express).

    Full precedence (first match wins): blocked_domain > exact_dup >
    near_dup > low_quality > c4_filtered > pii_heavy > lm_tail.

    ``persist_level`` (e.g. ``"DISK_ONLY"``, ``"MEMORY_AND_DISK"``) sets an
    explicit **stage-materialization boundary** after the map-only flags and
    the exact-dedup join.  Without it the single manifest action is one lazy
    DAG in which every downstream branch re-derives its upstream: the
    near-dup verify join scans its input ~3x and the LM rescore once more,
    so the exact-dedup shuffle re-executes ~5x and the source scan ~8x —
    correct, but quadratic-feeling wall time as stages are added.  With it,
    the annotated+exact-flagged frame is computed once and every branch
    reads the persisted blocks, which is the in-session equivalent of what
    a 100 TB multi-job pipeline does by writing each stage boundary to
    durable storage.  The caller owns cleanup (``spark.catalog.clearCache()``
    or unpersisting via the returned frame's lineage) once the manifest is
    materialized.

    ``minhash_method`` selects the near-dup signature kernel
    (:func:`sketchlib.dedup.minhash.minhash_signatures`): ``"perm"``
    (classic) or ``"oph"`` (one-permutation hashing — O(shingles + k)
    per doc; candidates are exact-verified either way so the manifest
    decisions are kernel-independent for pairs above threshold)."""
    from sketchlib.dedup.exact import dedup_exact
    from sketchlib.dedup.minhash import near_dup_pairs

    sel = [id_col, text_col]
    if blocklist is not None and url_col not in sel:
        sel.append(url_col)
    ann = annotate(docs.select(*sel), text_col)

    if blocklist is not None:
        from sketchlib.text.urls import url_domain

        bcol = blocklist.columns[0]
        bl = (blocklist.select(F.lower(F.col(bcol)).alias("__bldom"))
              .distinct())
        ann = (ann.withColumn("__bldom", url_domain(F.col(url_col)))
               .join(F.broadcast(bl.withColumn("__blocked", F.lit(True))),
                     "__bldom", "left")
               .withColumn("__blocked",
                           F.coalesce(F.col("__blocked"), F.lit(False)))
               .drop("__bldom",
                     *([url_col] if url_col != id_col else [])))
    else:
        ann = ann.withColumn("__blocked", F.lit(False))

    if c4_rules:
        from sketchlib.text.c4 import STAT_COLS, with_c4_stats

        ann = (with_c4_stats(ann, text_col)
               .withColumn("__c4_fail", ~F.col("c4_keep"))
               .drop(*STAT_COLS))
    else:
        ann = ann.withColumn("__c4_fail", F.lit(False))

    if max_pii is not None:
        from sketchlib.text.pii import pii_counts

        total = None
        for c in pii_counts(F.col(text_col)):
            total = c if total is None else total + c
        ann = ann.withColumn("__pii_heavy", total > int(max_pii))
    else:
        ann = ann.withColumn("__pii_heavy", F.lit(False))

    # dedup runs on non-blocked docs only: a blocked doc must not claim
    # survivorship of a duplicate group (its non-blocked copies survive)
    exact_survivors = dedup_exact(
        ann.filter(~F.col("__blocked")), text_col, id_col).select(
        F.col(id_col).alias("__keep_id"))
    ann = ann.join(exact_survivors,
                   ann[id_col] == F.col("__keep_id"), "left")
    ann = ann.withColumn("__exact_dup", F.col("__keep_id").isNull()) \
             .drop("__keep_id")
    if persist_level is not None:
        from pyspark import StorageLevel

        ann = ann.persist(getattr(StorageLevel, persist_level))

    persisted_frames = [ann] if persist_level is not None else []
    if near_dup:
        # near-dup runs on exact-dedup survivors only (exact dups would
        # flood the LSH buckets with jaccard=1.0 pairs)
        survivors = ann.filter(~F.col("__exact_dup")).select(id_col, text_col)
        pairs = near_dup_pairs(survivors, text_col, id_col,
                               threshold=jaccard, method=minhash_method)
        from ..spark.cacheutil import tagged_intermediates

        persisted_frames += tagged_intermediates(pairs)
        near_losers = (pairs.select(F.col("id_b").alias("__near_id"))
                       .distinct())
        ann = (ann.join(near_losers, ann[id_col] == F.col("__near_id"),
                        "left")
               .withColumn("__near_dup", F.col("__near_id").isNotNull())
               .drop("__near_id"))
    else:
        ann = ann.withColumn("__near_dup", F.lit(False))

    if min_mean_logp_milli is not None:
        from sketchlib.text.lmscore import score_docs, train_unigram_lm

        lm = train_unigram_lm(docs.select(text_col), text_col,
                              vocab_size=lm_vocab_size)
        # score the annotated frame INLINE (map-only): a join back by id
        # would shuffle 24M+ string keys and recompute the text scan.
        # keep_text=False: this is the last stage that reads the text, so
        # it is consumed by the JVM tokenizer and never crosses to Python
        ann = (score_docs(ann, lm, text_col, keep_text=False)
               .withColumn(
                   "__lm_tail",
                   (F.col("n_tokens") == 0)
                   | (F.col("sum_logp_milli")
                      < F.lit(int(min_mean_logp_milli))
                      * F.col("n_tokens")))
               .drop("n_tokens", "n_oov", "sum_logp_milli"))
    else:
        ann = ann.withColumn("__lm_tail", F.lit(False))

    reason = (F.when(F.col("__blocked"), F.lit("blocked_domain"))
              .when(F.col("__exact_dup"), F.lit("exact_dup"))
              .when(F.col("__near_dup"), F.lit("near_dup"))
              .when(F.col("quality") < min_quality, F.lit("low_quality"))
              .when(F.col("__c4_fail"), F.lit("c4_filtered"))
              .when(F.col("__pii_heavy"), F.lit("pii_heavy"))
              .when(F.col("__lm_tail"), F.lit("lm_tail")))
    from ..spark.cacheutil import tag_intermediates

    # the caller releases near_dup_pairs' persisted candidate frame and
    # the optional ann persist via unpersist_intermediates(manifest) once
    # its terminal action has run — without the tag, library callers
    # batching many corpora through one session leak cached blocks
    return tag_intermediates(
        ann.select(
            id_col,
            reason.isNull().alias("keep"),
            reason.alias("drop_reason"),
            "pred_lang", "quality", "n_chars", "n_bpe_tokens"),
        *persisted_frames)


def apply_mix(manifest: DataFrame, docs: DataFrame, targets: dict[str, float],
              source_col: str = "source", id_col: str = "doc_id") -> DataFrame:
    """Optional final pipeline stage: re-mix the KEPT docs to target source
    proportions by bpe-token mass (:func:`sketchlib.sampling.mix_by_source`).
    Docs deselected by the mix get ``keep = false`` with drop_reason
    ``mixed_out``; dropped docs are untouched, so the drop accounting stays
    disjoint.  Plan shape: one O(#sources) agg over kept rows + a
    hash-stable anti-join flag — no shuffle of the corpus."""
    from sketchlib.sampling import mix_by_source

    kept = (manifest.filter("keep")
            .join(docs.select(id_col, source_col), id_col))
    mixed_ids = (mix_by_source(kept, source_col, targets, id_col,
                               "n_bpe_tokens")
                 .select(F.col(id_col).alias("__mix_id")))
    out = (manifest.join(mixed_ids,
                         manifest[id_col] == F.col("__mix_id"), "left")
           .withColumn("__mixed_out",
                       F.col("keep") & F.col("__mix_id").isNull())
           .drop("__mix_id"))
    return (out.select(
        id_col,
        (F.col("keep") & ~F.col("__mixed_out")).alias("keep"),
        F.when(F.col("__mixed_out"), F.lit("mixed_out"))
        .otherwise(F.col("drop_reason")).alias("drop_reason"),
        "pred_lang", "quality", "n_chars", "n_bpe_tokens"))


def summarize(manifest: DataFrame, docs: DataFrame, id_col: str,
              text_col: str) -> dict:
    """Disjoint drop accounting + corpus-diversity HLL over kept docs.

    Runs three actions over ``manifest`` — pass a MATERIALIZED manifest
    (written+reread, as the CLI does, or ``.persist()``-ed), or each
    action recomputes the full cleaning DAG including the LM rescore."""
    from sketchlib.spark.aggregate import distinct_count
    from sketchlib.text.analysis import fingerprint_key

    counts = {r["drop_reason"] or "kept": r["n"] for r in
              manifest.groupBy("drop_reason").agg(F.count("*").alias("n"))
              .collect()}
    kept_stats = (manifest.filter("keep")
                  .agg(F.sum("n_bpe_tokens").alias("tok"),
                       F.count("*").alias("n")).collect()[0])
    kept_docs = (docs.join(manifest.filter("keep").select(id_col), id_col)
                 .select(fingerprint_key(F.col(text_col)).alias("fp")))
    [div] = distinct_count(kept_docs, "fp",
                           estimate_name="distinct_fps").collect()
    return {
        "n_docs": sum(counts.values()),
        "kept": counts.get("kept", 0),
        "dropped_exact_dup": counts.get("exact_dup", 0),
        "dropped_near_dup": counts.get("near_dup", 0),
        "dropped_low_quality": counts.get("low_quality", 0),
        "dropped_c4_filtered": counts.get("c4_filtered", 0),
        "dropped_blocked_domain": counts.get("blocked_domain", 0),
        "dropped_pii_heavy": counts.get("pii_heavy", 0),
        "dropped_lm_tail": counts.get("lm_tail", 0),
        "dropped_mixed_out": counts.get("mixed_out", 0),
        "kept_bpe_tokens": int(kept_stats["tok"] or 0),
        "kept_distinct_fingerprints_hll": int(div["distinct_fps"]),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-quality", type=int, default=3)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--minhash-method", default="perm",
                    choices=("perm", "oph"),
                    help="MinHash signature kernel: classic k-permutation "
                         "or one-permutation hashing (O(shingles + k) per "
                         "doc; same exact verify)")
    ap.add_argument("--blocklist", default=None,
                    help="parquet/csv of blocked domains (first column); "
                         "drops docs whose --url-col domain matches")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--c4-rules", action="store_true",
                    help="drop docs failing the C4 page rules "
                         "(Raffel et al. 2020 §2.2)")
    ap.add_argument("--max-pii", type=int, default=None,
                    help="drop docs with more than this many PII spans")
    ap.add_argument("--min-mean-logp-milli", type=int, default=None,
                    help="drop docs whose mean token log-prob under a "
                         "corpus-trained unigram LM (milli-nats) is below "
                         "this threshold")
    ap.add_argument("--lm-vocab-size", type=int, default=50_000)
    ap.add_argument("--persist-level", default="DISK_ONLY",
                    help="StorageLevel name for the stage-materialization "
                         "boundary after annotate+exact-dedup (NONE to "
                         "disable and run the fully lazy DAG)")
    ap.add_argument("--mix-targets", default=None,
                    help='JSON {"source": share, ...} summing to 1: re-mix '
                         "kept docs to these proportions by bpe-token mass "
                         "(downsample-only, hash-stable)")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--local-cpus", default=None)
    args = ap.parse_args(argv)

    from sketchlib.spark.session import build_session

    preexisting = SparkSession.getActiveSession() is not None
    spark = build_session("corpus-clean", local_cpus=args.local_cpus)
    docs = spark.read.parquet(args.input)
    bl = None
    if args.blocklist:
        # text/csv ONLY for explicit .csv/.txt paths; everything else —
        # including the normal Spark layout, a parquet DIRECTORY — reads
        # as parquet.  (The old endswith('.parquet') check sent parquet
        # directories through the csv reader, which parsed the binary
        # files into garbage domains and silently blocked NOTHING.)
        if args.blocklist.endswith((".csv", ".txt")):
            bl = spark.read.option("header", "false").csv(args.blocklist)
        else:
            bl = spark.read.parquet(args.blocklist)
    manifest = clean_corpus(docs, args.text_col, args.id_col,
                            min_quality=args.min_quality,
                            near_dup=not args.no_near_dup,
                            jaccard=args.jaccard,
                            blocklist=bl, url_col=args.url_col,
                            max_pii=args.max_pii,
                            c4_rules=args.c4_rules,
                            min_mean_logp_milli=args.min_mean_logp_milli,
                            lm_vocab_size=args.lm_vocab_size,
                            persist_level=(None if args.persist_level == "NONE"
                                           else args.persist_level),
                            minhash_method=args.minhash_method)
    if args.mix_targets:
        manifest = apply_mix(manifest, docs, json.loads(args.mix_targets),
                             args.source_col, args.id_col)
    manifest.write.mode("overwrite").parquet(args.output)
    spark.catalog.clearCache()  # manifest is durable; drop the boundary
    manifest = spark.read.parquet(args.output)  # summarize the written file
    print(json.dumps(summarize(manifest, docs, args.id_col, args.text_col)))
    if not preexisting:  # don't tear down a session we merely joined
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
