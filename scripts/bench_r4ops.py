"""Throughput measurements for the round-4-late operators (C4 cleaning
rules, paragraph-level dedup, CountSketch build + point queries) at 24M-row
scale, plus single-thread CountSketch kernel rates.

Prints a markdown table (min-of-REPS walls) for BENCH/BASELINE.md.

    python scripts/bench_r4ops.py [--reps 2] [--rows 24000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--rows", type=int, default=24_000_000)
    args = ap.parse_args()

    # -- single-thread CountSketch kernel rates (no Spark needed) ----------
    import numpy as np

    from sketchlib.ams import AmsSketch

    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**64, size=2_000_000, dtype=np.uint64)
    kernel_rows: list[tuple[str, int, float]] = []
    sk = AmsSketch(width=1 << 12, depth=7)
    sk.add_hashes(h[:10_000])  # warm
    best = float("inf")
    for _ in range(5):
        s2 = AmsSketch(width=1 << 12, depth=7)
        t0 = time.time()
        s2.add_hashes(h)
        best = min(best, time.time() - t0)
    kernel_rows.append(("countsketch add_hashes (1 thread, w=4096 d=7)",
                        h.shape[0], best))
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        s2.estimate_hashes(h)
        best = min(best, time.time() - t0)
    kernel_rows.append(("countsketch estimate_hashes (1 thread)",
                        h.shape[0], best))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("sketchlib-r4ops-bench")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    n = args.rows
    # deterministic multi-line / multi-paragraph corpus: three sentence
    # lines (kept by C4) + a no-punct line + a short line (dropped), and
    # for the dedup bench a corpus-wide boilerplate paragraph + a parity
    # footer so the winner aggregate sees million-fold hot keys
    word = (F.abs(F.xxhash64("id")) % F.lit(100_000)).cast("string")
    docs = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("Document body sentence number "), word,
            F.lit(" ends with a period here.\n"),
            F.lit("tiny line\n"),
            F.lit("Second sentence of the body also ends properly today "),
            word, F.lit(".\n"),
            F.lit("a trailing line with many words but no terminal mark "),
            word).alias("text")))
    para_docs = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("Shared cookie banner paragraph.\n\n"),
            F.lit("Unique paragraph "), word, F.lit(" body "),
            F.col("id").cast("string"),
            F.when(F.col("id") % 2 == 0,
                   F.lit("\n\nEven footer paragraph."))
            .otherwise(F.lit("\n\nOdd footer paragraph."))).alias("text")))
    users = (spark.range(n)
             .select((F.col("id") % 1_000_000).alias("user_id")))

    docs.persist().count()
    para_docs.persist().count()
    users.persist().count()

    rows_out: list[tuple[str, int, float]] = list(kernel_rows)

    def bench(name, rows, thunk):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            thunk()
            best = min(best, time.time() - t0)
        rows_out.append((name, rows, best))
        print(f"... {name}: {best:.2f}s ({rows / best:,.0f} rows/s)")

    from sketchlib.dedup.paragraphs import dedup_paragraphs
    from sketchlib.spark.aggregate import sketch_agg
    from sketchlib.spark.specs import AmsSpec
    from sketchlib.text.c4 import with_c4_stats

    bench("c4 rules (24M 4-line docs, full stats)", n,
          lambda: with_c4_stats(docs).agg(
              F.sum(F.when(F.col("c4_keep"), 1).otherwise(0)),
              F.sum("c4_n_kept_lines")).collect())

    bench("paragraph dedup (24M docs x 3 paragraphs, hot boilerplate)", n,
          lambda: dedup_paragraphs(para_docs).agg(
              F.count(F.lit(1)), F.sum(F.length("text"))).collect())

    spec = AmsSpec(width=1 << 12, depth=7)
    bench("countsketch distributed build (24M rows, 1M users)", n,
          lambda: sketch_agg(users, "user_id", (), spec).collect())

    # -- global sort head-to-head: sketch-driven balanced_sort vs Spark's
    # RangePartitioner (sampling job + range exchange).  noop write
    # materializes every row WITH its ordering (count() would let Catalyst
    # drop the sort).  Both sides pay their own boundary cost: the KLL
    # scan for ours, the reservoir-sampling job for Spark's.
    from sketchlib.spark.ranges import balanced_sort, kll_boundaries, \
        repartition_by_boundaries

    vals = (spark.range(n)
            .select((F.abs(F.xxhash64("id")) % F.lit(10**9))
                    .cast("double").alias("v")))
    vals.persist().count()
    parts = int(CPUS)
    bench(f"global sort, Spark repartitionByRange({parts}) (24M doubles)", n,
          lambda: vals.repartitionByRange(parts, "v")
          .sortWithinPartitions("v")
          .write.mode("overwrite").format("noop").save())
    bench(f"global sort, sketch balanced_sort({parts}) (24M doubles)", n,
          lambda: balanced_sort(vals, "v", parts)
          .write.mode("overwrite").format("noop").save())
    bench(f"global sort, balanced_sort({parts}) w/ 2% sampled boundaries",
          n, lambda: balanced_sort(vals, "v", parts, sample_fraction=0.02)
          .write.mode("overwrite").format("noop").save())
    bounds = kll_boundaries(vals, "v", parts)
    bench(f"global sort, balanced_sort({parts}) w/ reused profile blob", n,
          lambda: repartition_by_boundaries(vals, "v", bounds,
                                            sort_within=True)
          .write.mode("overwrite").format("noop").save())
    vals.unpersist()

    print()
    print("| operator | rows | wall (s) | rows/sec |")
    print("|---|---|---|---|")
    for name, rows, best in rows_out:
        print(f"| {name} | {rows:,} | {best:.2f} | {rows / best:,.0f} |")


if __name__ == "__main__":
    main()
