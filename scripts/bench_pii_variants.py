"""Measure PII-scrub formulations on the cached pages table.

Variants:
  counts4     - current: four regexp_count passes
  counts4g    - four regexp_count passes, each behind a sound contains()
                literal prefilter ('@', '+', '-', '.')
  redact4     - current: four sequential regexp_replace passes
  redact4g    - sequential replaces behind the same contains() guards
  redactfused - one combined-alternation pass: split + regexp_extract_all
                + per-span classification + array_join

Usage: python scripts/bench_pii_variants.py [--rows 4000000] [--cpus 32]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sketchlib.text.pii import PII_PATTERNS  # noqa: E402

PREFILTER = {"email": "@", "phone": "+", "id": "-", "ip": "."}
COMBINED = "|".join(f"(?:{p})" for _, p, _ in PII_PATTERNS)


def counts4(c):
    return [F.regexp_count(c, F.lit(p)).alias(f"n_{n}")
            for n, p, _ in PII_PATTERNS]


def counts4g(c):
    return [F.when(F.contains(c, F.lit(PREFILTER[n])),
                   F.regexp_count(c, F.lit(p))).otherwise(F.lit(0))
            .alias(f"n_{n}") for n, p, _ in PII_PATTERNS]


def redact4(c):
    out = c
    for _, p, ph in PII_PATTERNS:
        out = F.regexp_replace(out, p, ph)
    return out


def redact4g(c):
    out = c
    for n, p, ph in PII_PATTERNS:
        out = F.when(F.contains(out, F.lit(PREFILTER[n])),
                     F.regexp_replace(out, p, ph)).otherwise(out)
    return out


def redactfused(c):
    parts = F.split(c, COMBINED, -1)
    spans = F.regexp_extract_all(c, F.lit("(" + COMBINED + ")"), 1)
    def classify(s):
        out = F.lit(None).cast("string")
        exprs = []
        for n, p, ph in PII_PATTERNS:
            exprs.append((s.rlike("^(?:" + p + ")$"), ph))
        r = F.when(exprs[0][0], exprs[0][1])
        for cond, ph in exprs[1:]:
            r = r.when(cond, ph)
        return r
    ph = F.transform(spans, classify)
    merged = F.zip_with(parts, ph,
                        lambda p, h: F.concat(p, F.coalesce(h, F.lit(""))))
    return F.array_join(merged, "")


def realistic_text(spark, rows):
    """Deterministic English-like docs: '.' in every doc (sentence periods),
    '-' in most (hyphenated words), '@' / '+' / PII spans at a few percent —
    the guard's WORST case, unlike the pages table whose synthetic text
    contains no guard characters at all (there the guard measures the
    all-skip fast path)."""
    sentence = ("The quick brown fox jumps over the lazy dog near the "
                "river bank. It was a bright cold day in April and the "
                "clocks were striking thirteen. ")
    i = F.col("id")
    return spark.range(rows).select(F.concat(
        F.repeat(F.lit(sentence), (i % 8 + 4).cast("int")),
        F.when(i % 2 == 0, F.lit(" A state-of-the-art well-known result. "))
         .otherwise(F.lit(" Plain prose continues here. ")),
        F.when(i % 20 == 0,
               F.concat(F.lit(" contact user"), i, F.lit("@example.com now")))
         .otherwise(F.lit("")),
        F.when(i % 33 == 0, F.lit(" call +1 (555) 123-4567 today"))
         .otherwise(F.lit("")),
        F.when(i % 41 == 0, F.lit(" ssn 123-45-6789 leaked"))
         .otherwise(F.lit("")),
        F.when(i % 29 == 0,
               F.concat(F.lit(" from 192.168.0."), (i % 256).cast("string")))
         .otherwise(F.lit("")),
        F.repeat(F.lit(sentence), (i % 5 + 2).cast("int")),
    ).alias("text"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.path.join(REPO, ".benchdata", "pages"))
    ap.add_argument("--rows", type=int, default=0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--realistic", action="store_true",
                    help="synthesize guard-char-dense text instead of the "
                         "pages table (honest guard-overhead measurement)")
    args = ap.parse_args()

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.driver.memory", "48g")
             .appName("pii-variants").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    if args.realistic:
        df = realistic_text(spark, args.rows or 1_000_000)
    else:
        df = spark.read.parquet(args.data).select("text")
        if args.rows:
            df = df.limit(args.rows)
    df = df.persist()
    n = df.count()
    print(f"rows={n}")

    def run(name, frame, agg_col):
        # the aggregate CONSUMES the computed column — with a bare
        # count(*), Catalyst prunes the regex work out of the plan and the
        # timing measures nothing
        best = float("inf")
        for _ in range(args.reps):
            t = time.time()
            frame.agg(F.sum(agg_col).alias("s")).collect()
            best = min(best, time.time() - t)
        print(f"{name:12s} {best:8.2f}s  {n/best/1000:10.1f}k docs/s",
              flush=True)
        return best

    c = F.col("text")
    run("counts4", df.select([*counts4(c)]).select(
        sum(F.col(f"n_{x}") for x, _, _ in PII_PATTERNS).alias("p")), "p")
    run("counts4g", df.select([*counts4g(c)]).select(
        sum(F.col(f"n_{x}") for x, _, _ in PII_PATTERNS).alias("p")), "p")
    run("redact4", df.select(F.length(redact4(c)).alias("L")), "L")
    run("redact4g", df.select(F.length(redact4g(c)).alias("L")), "L")
    run("redactfused", df.select(F.length(redactfused(c)).alias("L")), "L")

    # sanity: identical outputs across redact variants on a sample
    s = (realistic_text(spark, 200000) if args.realistic
         else spark.read.parquet(args.data).select("text").limit(200000))
    a = s.select(F.md5(F.coalesce(redact4(F.col("text")), F.lit(""))).alias("h"))
    for nm, fn in (("redact4g", redact4g), ("redactfused", redactfused)):
        b = s.select(F.md5(F.coalesce(fn(F.col("text")), F.lit(""))).alias("h"))
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"equiv {nm}: {'OK' if diff == 0 else f'MISMATCH {diff}'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
