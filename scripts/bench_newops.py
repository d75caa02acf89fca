"""Throughput measurements for the round-3-late operators (DDSketch build,
sessionization, PQ encode / ADC scan) at synthetic 24M/1M-row scale.

Prints a markdown table (min-of-REPS walls) for BENCH/BASELINE.md.

    python scripts/bench_newops.py [--reps 2]
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
    ap.add_argument("--vec-rows", type=int, default=1_000_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("sketchlib-newops-bench")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    _identity = F.pandas_udf(lambda s: s, "long")
    (spark.range(int(CPUS) * 4).repartition(int(CPUS))
     .select(_identity("id").alias("x")).selectExpr("sum(x)").collect())

    n = args.rows
    # deterministic synthetic event stream: 1M users, hash-jittered
    # timestamps spread over ~30 days so sessions are non-trivial
    events = (spark.range(n)
              .withColumn("user_id", F.col("id") % 1_000_000)
              .withColumn("ts", F.timestamp_micros(
                  F.lit(1_700_000_000_000_000)
                  + (F.xxhash64("id") % F.lit(2_592_000_000_000)).cast("long")
                  * F.lit(1000))))
    # deterministic long-tailed value column for the quantile builds
    values = (spark.range(n)
              .withColumn("v", (F.abs(F.xxhash64("id")) % F.lit(1_000_000))
                          / F.lit(100.0) + F.lit(0.01)))
    # deterministic 64-dim embeddings
    d = 64
    vecs = (spark.range(args.vec_rows)
            .withColumn("emb", F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: (F.xxhash64("id", i) % F.lit(10_000))
                .cast("double") / F.lit(10_000.0))))

    rows_out: list[tuple[str, int, float]] = []

    def bench(name, rows, thunk):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            thunk()
            best = min(best, time.time() - t0)
        rows_out.append((name, rows, best))
        print(f"... {name}: {best:.2f}s ({rows / best:,.0f} rows/s)")

    from sketchlib.spark.aggregate import sketch_agg
    from sketchlib.spark.sessions import session_stats
    from sketchlib.spark.specs import DdSpec, KllSpec, TDigestSpec
    from sketchlib.similarity.pq import adc_topk, pq_encode, train_codebooks

    events.persist().count()
    values.persist().count()
    vecs.persist().count()

    bench("session_stats (24M events, 1M users, 30min gap)", n,
          lambda: session_stats(events, gap_seconds=1800)
          .agg(F.count(F.lit(1)), F.sum("n_events")).collect())

    for label, spec in (("ddsketch", DdSpec(alpha=0.01)),
                        ("tdigest", TDigestSpec()),
                        ("kll", KllSpec())):
        bench(f"{label} global build (24M doubles)", n,
              lambda s=spec: sketch_agg(values, "v", (), s).collect())

    cb = train_codebooks(vecs, vec_col="emb", m=8, ksub=256,
                         sample_rows=50_000, iters=8, seed=3)
    enc = pq_encode(vecs, cb, vec_col="emb")
    codes_dir = os.path.join(REPO, ".benchdata", "pq_codes_bench")
    bench("pq_encode 1M x 64-dim (m=8, ksub=256) + write", args.vec_rows,
          lambda: enc.select("id", "pq_code").write.mode("overwrite")
          .parquet(codes_dir))
    codes = spark.read.parquet(codes_dir)
    qs = [(i, [((i * 131 + j * 17) % 10_000) / 10_000.0 for j in range(d)])
          for i in range(8)]
    bench("adc_topk 8 queries x 1M codes (k=10)", args.vec_rows,
          lambda: adc_topk(codes, qs, cb, k=10, id_col="id").collect())

    print()
    print("| operator | rows | wall (s) | rows/sec |")
    print("|---|---|---|---|")
    for name, rows, best in rows_out:
        print(f"| {name} | {rows:,} | {best:.2f} | {rows / best:,.0f} |")
    spark.stop()


if __name__ == "__main__":
    main()
