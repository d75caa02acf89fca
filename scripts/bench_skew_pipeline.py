"""Skew-handling evidence for the corpus-pipeline operators at 24M rows.

The r2 report proved measured salting for the HLL build path
(``tests/test_skew.py`` + scaling bench); this bench extends the evidence
to the pipeline operators a web corpus actually funnels a Zipf host key
through:

* ``cap_per_group`` — its claimed skew mitigation is Catalyst's *Partial*
  ``WindowGroupLimit`` (map-side pre-cap: a hub group ships
  ``cap x n_partitions`` rows instead of its full mass).  Measured here
  under a true hub key (harmonic host law, hub host ~ half the corpus)
  with the rule ON vs OFF (``spark.sql.optimizer.windowGroupLimitThreshold
  = -1`` disables it, shuffling all hub rows into one partition).
* ``heavy_hitters`` — bounded Misra-Gries partials + CMS verify; measured
  on the Zipf key vs a uniform key of the same cardinality to show the
  operator is skew-insensitive (map-side candidate state is capacity-
  bounded regardless of key mass).

    python scripts/bench_skew_pipeline.py [--data .benchdata/pages24m]
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
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sketchlib.sampling import cap_per_group
    from sketchlib.spark.heavy_hitters import heavy_hitters
    from sketchlib.spark.specs import CmsSpec

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic harmonic (Zipf-ish) host key: P(host k) ~ 1/(k(k+1));
    # the hub host h0 owns ~half of all rows.  uniform control key has the
    # same cardinality (1000 hosts).
    u = (F.pmod(F.xxhash64("url"), F.lit(1_000_000)) + 1) / 1_000_000.0
    zipf_host = F.concat(F.lit("h"), F.least(
        F.lit(999), F.floor(1.0 / u) - 1).cast("string"))
    unif_host = F.concat(F.lit("h"), F.pmod(F.xxhash64("url"),
                                            F.lit(1000)).cast("string"))
    df = (spark.read.parquet(args.data)
          .select("url", zipf_host.alias("zipf_host"),
                  unif_host.alias("unif_host")))
    n_rows = df.count()
    hub = (df.groupBy("zipf_host").count().orderBy(F.desc("count"))
           .limit(1).collect()[0])
    print(json.dumps({"rows": n_rows, "hub_host": hub["zipf_host"],
                      "hub_rows": hub["count"]}), flush=True)

    def timed(fn):
        walls = []
        out = None
        for _ in range(args.reps):
            t0 = time.time()
            out = fn()
            walls.append(time.time() - t0)
        return round(min(walls), 2), out

    results: dict = {"rows": n_rows, "hub_rows": hub["count"]}

    def cap_run():
        return cap_per_group(df.select("url", "zipf_host"),
                             ["zipf_host"], 100, ["url"]).count()

    wall_on, kept = timed(cap_run)
    results["cap_per_group_zipf_grouplimit_on"] = {
        "wall_sec": wall_on, "docs_per_sec": round(n_rows / wall_on, 1),
        "out_rows": kept}
    try:
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
        wall_off, kept_off = timed(cap_run)
    finally:
        spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    assert kept_off == kept
    results["cap_per_group_zipf_grouplimit_off"] = {
        "wall_sec": wall_off, "docs_per_sec": round(n_rows / wall_off, 1),
        "out_rows": kept_off}
    results["cap_grouplimit_speedup"] = round(wall_off / wall_on, 2)

    for key in ("zipf_host", "unif_host"):
        wall, rows = timed(lambda: heavy_hitters(
            df.select(F.col(key).alias("host")), "host", k=20,
            spec=CmsSpec()).count())
        results[f"heavy_hitters_{key}"] = {
            "wall_sec": wall, "docs_per_sec": round(n_rows / wall, 1),
            "out_rows": rows}
    z = results["heavy_hitters_zipf_host"]["wall_sec"]
    uw = results["heavy_hitters_unif_host"]["wall_sec"]
    results["heavy_hitters_zipf_over_uniform"] = round(z / uw, 2)

    print(json.dumps(results), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
