"""Phase-by-phase wall-clock profile of the corpus-clean e2e DAG.

Mirrors jobs/corpus_job.clean_corpus with the same library calls but an
action after each phase, to locate where the e2e wall time goes:

    python scripts/profile_corpus_e2e.py [--frac 0.1] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.path.join(REPO, ".benchdata", "pages24m"))
    ap.add_argument("--frac", type=float, default=1.0)
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from sketchlib.spark.session import build_session
    from sketchlib.sampling import sample_by_hash
    from sketchlib.jobs.corpus_job import annotate
    from sketchlib.dedup.exact import dedup_exact
    from sketchlib.dedup.minhash import near_dup_pairs
    from sketchlib.text.pii import pii_counts
    from sketchlib.text.urls import url_domain
    from sketchlib.text.lmscore import score_docs, train_unigram_lm

    spark = build_session("corpus-profile", local_cpus=args.cpus,
                          extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.data).select("url", "text")
    if args.frac < 1.0:
        docs = sample_by_hash(docs, "url", args.frac)
    t = {}
    t0 = time.time()
    n = docs.count()
    t["read_count"] = time.time() - t0

    bl = spark.createDataFrame(
        [(f"blocked{i}.example.com",) for i in range(1000)], "d string")

    # phase A: annotate + blocklist + pii + exact-dup flag, persisted
    t0 = time.time()
    ann = annotate(docs, "text")
    blx = (bl.select(F.lower("d").alias("__bldom"))
           .distinct().withColumn("__blocked", F.lit(True)))
    ann = (ann.withColumn("__bldom", url_domain(F.col("url")))
           .join(F.broadcast(blx), "__bldom", "left")
           .withColumn("__blocked", F.coalesce("__blocked", F.lit(False)))
           .drop("__bldom"))
    total = None
    for c in pii_counts(F.col("text")):
        total = c if total is None else total + c
    ann = ann.withColumn("__pii_heavy", total > 2)
    surv = dedup_exact(ann.filter(~F.col("__blocked")), "text", "url") \
        .select(F.col("url").alias("__keep_id"))
    ann = (ann.join(surv, ann["url"] == F.col("__keep_id"), "left")
           .withColumn("__exact_dup", F.col("__keep_id").isNull())
           .drop("__keep_id")
           .persist(StorageLevel.DISK_ONLY))
    ann.count()
    t["A_annotate_flags_exact_persist"] = time.time() - t0

    # phase B: near-dup pairs over survivors (reads the cache)
    t0 = time.time()
    pairs = near_dup_pairs(
        ann.filter(~F.col("__exact_dup")).select("url", "text"),
        "text", "url", threshold=0.8)
    n_losers = pairs.select("id_b").distinct().count()
    t["B_near_dup_pairs"] = time.time() - t0

    # phase C: unigram LM train over the raw corpus
    t0 = time.time()
    lm = train_unigram_lm(docs.select("text"), "text", vocab_size=50_000)
    t["C_lm_train"] = time.time() - t0

    # phase D: LM rescore of the cached frame + final count
    t0 = time.time()
    scored = score_docs(ann, lm, "text", keep_text=False)
    kept = scored.filter(
        (F.col("n_tokens") > 0)
        & (F.col("sum_logp_milli") >= -9000 * F.col("n_tokens"))).count()
    t["D_lm_rescore_count"] = time.time() - t0

    print(json.dumps({"rows": n, "near_losers": n_losers, "kept_lm": kept,
                      "phases_sec": {k: round(v, 1) for k, v in t.items()},
                      "total_sec": round(sum(t.values()), 1)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
