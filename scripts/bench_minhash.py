"""MinHash signature-kernel bench: k-permutation vs one-permutation hashing.

Measures the signature pass alone (the dominant Python-stage cost of
near_dup_pairs) on the cached 24M-row pages table, forcing full
computation with a JVM aggregate over the produced signatures:

    python scripts/bench_minhash.py [--frac 0.25] [--cpus 32] [--reps 2]

Appends nothing; prints one JSON line.  Numbers land in
BENCH/BASELINE.md's dedup section.
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
    ap.add_argument("--frac", type=float, default=0.25)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--n-hashes", type=int, default=128)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sketchlib.dedup.minhash import minhash_signatures
    from sketchlib.sampling import sample_by_hash
    from sketchlib.spark.session import build_session

    spark = build_session("minhash-kernel-bench", local_cpus=args.cpus,
                          extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.data).select("url", "text")
    if args.frac < 1.0:
        docs = sample_by_hash(docs, "url", args.frac)
    n = docs.count()

    out = {"metric": "minhash_signature_docs_per_sec", "rows": n,
           "n_hashes": args.n_hashes, "cpus": args.cpus, "unit": "docs/sec"}
    for method in ("perm", "oph"):
        best = None
        for _ in range(args.reps):
            sig = minhash_signatures(docs, text_col="text", id_col="url",
                                     n_hashes=args.n_hashes, method=method)
            t0 = time.time()
            # checksum forces every signature value to materialize
            row = (sig.agg(F.bit_xor(F.xxhash64(F.col("sig"))).alias("ck"),
                           F.count("sig").alias("n")).collect()[0])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            out[f"{method}_ck"] = int(row["ck"]) & 0xFFFFFFFFFFFFFFFF
            out[f"{method}_sig_rows"] = row["n"]
        out[f"{method}_wall_s"] = round(best, 2)
        out[f"{method}_docs_per_sec"] = int(n / best)
    out["speedup_oph_over_perm"] = round(
        out["perm_wall_s"] / out["oph_wall_s"], 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
