"""Cuckoo-filter throughput: single-thread kernel rates plus distributed
build / probe at 24M rows, and 2->8 core scaling efficiency for the build
(the north rule's N -> 4N criterion applied to the new operator).

Prints markdown rows for BENCH/BASELINE.md.

    python scripts/bench_cuckoo.py [--reps 2] [--rows 24000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _session(cores: str):
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"sketchlib-cuckoo-bench-{cores}")
             .config("spark.sql.shuffle.partitions", cores)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--rows", type=int, default=24_000_000)
    args = ap.parse_args()

    import numpy as np

    from sketchlib.cuckoo import CuckooFilter, optimal_params

    rng = np.random.default_rng(7)
    n1 = 2_000_000
    h = rng.integers(0, 2**64, size=n1, dtype=np.uint64)
    h = np.unique(h)
    nb = optimal_params(h.shape[0])
    rows_out: list[tuple[str, int, float]] = []

    def best_of(reps, thunk):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            thunk()
            best = min(best, time.time() - t0)
        return best

    cf = CuckooFilter(n_buckets=nb)
    cf.add_hashes(h[:10_000])  # warm numpy dispatch
    holder: dict[str, CuckooFilter] = {}

    def build():
        c = CuckooFilter(n_buckets=nb)
        c.add_hashes(h)
        holder["cf"] = c

    rows_out.append((f"cuckoo add_hashes (1 thread, 2M uniq, load "
                     f"{h.shape[0] / (nb * 4):.2f})", h.shape[0],
                     best_of(5, build)))
    built = holder["cf"]
    rows_out.append(("cuckoo contains_hashes (1 thread)", h.shape[0],
                     best_of(5, lambda: built.contains_hashes(h))))

    def delete_half():
        c = CuckooFilter.from_bytes(built.to_bytes())
        c.delete_hashes(h[::2])

    rows_out.append(("cuckoo delete_hashes (1 thread, 1M deletes incl "
                     "from_bytes)", h[::2].shape[0], best_of(3, delete_half)))

    for name, n, wall in rows_out:
        print(f"... {name}: {wall:.2f}s ({n / wall:,.0f}/s)")

    # -- distributed build + probe at 24M rows -----------------------------
    from pyspark.sql import functions as F

    from sketchlib.spark.membership import (cuckoo_build_bytes,
                                            filter_might_contain)
    from sketchlib.spark.specs import CuckooSpec

    n = args.rows
    spec = CuckooSpec(expected_n=1_000_000)
    walls: dict[str, dict[str, float]] = {}
    for cores in dict.fromkeys(("2", "8", CPUS)):
        spark = _session(cores)
        users = (spark.range(n)
                 .select((F.col("id") % 1_000_000).alias("user_id")))
        users.persist().count()
        w = best_of(args.reps,
                    lambda: cuckoo_build_bytes(users, "user_id", spec=spec))
        walls.setdefault("build", {})[cores] = w
        print(f"... cuckoo distributed build local[{cores}]: {w:.2f}s "
              f"({n / w:,.0f} rows/s)")
        if cores == CPUS:
            blob = cuckoo_build_bytes(users, "user_id", spec=spec)
            probe = (spark.range(n)
                     .select((F.col("id") % 2_000_000).alias("user_id")))
            probe.persist().count()
            w = best_of(args.reps, lambda: filter_might_contain(
                probe, "user_id", blob, spec=spec)
                .agg(F.count(F.lit(1))).collect())
            walls.setdefault("probe", {})[cores] = w
            print(f"... cuckoo probe filter local[{cores}]: {w:.2f}s "
                  f"({n / w:,.0f} rows/s)")
        users.unpersist()
        spark.stop()

    b = walls["build"]
    eff = (n / b["8"]) / (4 * (n / b["2"]))
    print()
    print("| operation | rows | wall s | rows/s |")
    print("|---|---|---|---|")
    for name, cnt, wall in rows_out:
        print(f"| {name} | {cnt:,} | {wall:.2f} | {cnt / wall:,.0f} |")
    rows_label = f"{n / 1e6:g}M rows, 1M uniq"
    for cores, w in b.items():
        print(f"| cuckoo distributed build local[{cores}] "
              f"({rows_label}) | {n:,} | {w:.2f} | {n / w:,.0f} |")
    pw = walls["probe"][CPUS]
    print(f"| cuckoo probe filter local[{CPUS}] ({n / 1e6:g}M probes) | "
          f"{n:,} | {pw:.2f} | {n / pw:,.0f} |")
    print(f"\n2->8 core build scaling efficiency: {eff:.3f}")


if __name__ == "__main__":
    main()
