"""WARC ingestion throughput: synthesize an N-file archive from the
pages table, then measure read_warc -> pages docs/sec at local[CPUS].

    python scripts/bench_warc.py [--files 64] [--records 400000]
        [--cpus 32] [--report]

Parallelism = file count (the binaryFile contract), so --files should be
>= CPUS to keep every core fed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--records", type=int, default=400_000)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sketchlib.data.pages import generate_pages, wrap_html
    from sketchlib.data.warc import build_warc, read_warc, warc_to_pages

    out_dir = os.path.join(REPO, ".benchdata", "warc_bench")
    marker = os.path.join(out_dir,
                          f"_GENERATED_{args.files}_{args.records}")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        for f in os.listdir(out_dir):
            os.remove(os.path.join(out_dir, f))
        per = args.records // args.files
        t0 = time.time()
        row = 0
        for i in range(args.files):
            pdf = generate_pages(per, seed=1000 + i, n_days=7)
            recs = [(u, f"2026-01-0{1 + (row + j) % 7}T00:00:00Z",
                     bytes(h))
                    for j, (u, h) in enumerate(zip(pdf["url"], pdf["html"]))]
            row += per
            with open(os.path.join(out_dir, f"seg-{i:05d}.warc.gz"),
                      "wb") as fh:
                fh.write(build_warc(recs, gzip_records=True))
        open(marker, "w").close()
        print(f"generated {args.files} files x {per} records "
              f"in {time.time() - t0:.1f}s")
    n_rows = (args.records // args.files) * args.files

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    glob = os.path.join(out_dir, "*.warc.gz")

    def parse_only():
        return read_warc(spark, glob).agg(
            F.count(F.lit(1)), F.sum(F.length("html"))).collect()

    def full_pages():
        return warc_to_pages(spark, glob).agg(
            F.count(F.lit(1)), F.sum(F.length("text")),
            F.countDistinct("lang")).collect()

    walls = {}
    for name, fn in (("parse_only", parse_only),
                     ("warc_to_pages", full_pages)):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        walls[name] = best
        print(f"{name}: {best:.2f}s  {n_rows / best / 1e6:.2f}M docs/s")

    if args.report:
        total_gz = sum(os.path.getsize(os.path.join(out_dir, f))
                       for f in os.listdir(out_dir) if f.endswith(".gz"))
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
            fh.write(
                f"\n## WARC ingestion throughput (bench_warc.py, "
                f"local[{args.cpus}])\n\n"
                f"{args.files} per-record-gzipped files, {n_rows} records, "
                f"{total_gz / 1e6:.0f} MB compressed; min-of-{args.reps}."
                f"\n\n| path | wall | docs/s |\n|---|---|---|\n"
                + "".join(f"| {k} | {v:.2f}s | "
                          f"{n_rows / v / 1e6:.2f}M |\n"
                          for k, v in walls.items())
                + "\nParallelism = file count (binaryFile source: one "
                "file per task); gunzip + record parse run in the pandas "
                "kernel, extraction + lang id stay JVM-side.\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
