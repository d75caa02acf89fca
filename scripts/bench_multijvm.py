"""Multi-JVM scaling evidence (VERDICT r4 'next' #4).

BENCH/BASELINE.md documents an 8->32-core local-mode saturation and argues
it is a *single shared JVM* artifact (one JVM scan feeds all Python workers;
real clusters run one JVM per executor).  This script turns the argument
into a measurement: the flagship job — two-stage HLL `distinct url per
(lang, day)` over the generated pages table — is run as

  * 1 x local[32]   (the saturated single-JVM shape), and
  * 4 x local[8]    ("executors": subprocesses over DISJOINT file shards,
                     each building per-(lang, day) sketch partials and
                     writing them as a partial-sketch parquet, followed by
                     a driver-side merge of the K blob tables)

on the SAME input.  Workers start each timed round through a filesystem
barrier so their timed regions overlap (concurrent, like cluster
executors); the aggregate wall for a round is max(worker walls) + the
final blob-merge wall.  Associativity of the register-wise max-merge
(sketchlib/spark/aggregate.py merge_partials) makes the sharded result
bit-identical to the single-JVM result — asserted at the end.

Usage:
    python scripts/bench_multijvm.py [--rows 24000000] [--rounds 3]
    python scripts/bench_multijvm.py --child ... (internal)

Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GROUPS = ["lang", "day"]
ELEMENT = "url"


def shard_files(data_dir: str, k: int) -> list[list[str]]:
    """Greedy size-balanced split of the table's part files into k
    disjoint shards (the local analog of assigning input splits to
    executors)."""
    files = sorted(glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no parquet files under {data_dir}")
    sized = sorted(((os.path.getsize(f), f) for f in files), reverse=True)
    shards: list[list[str]] = [[] for _ in range(k)]
    loads = [0] * k
    for sz, f in sized:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += sz
    return shards


def child(args) -> None:
    from bench_common import build_session

    from sketchlib.spark.aggregate import HllSpec, sketch_agg

    with open(args.files) as fh:
        files = [ln.strip() for ln in fh if ln.strip()]
    # 12g heap: up to 4 of these JVMs run concurrently on one box
    spark = build_session(args.cpus, app=f"multijvm-w{args.worker}",
                          driver_mem="12g")
    df = (spark.read.option("basePath", args.base)
          .parquet(*files).select(ELEMENT, *GROUPS))
    rows = df.count()  # warm scan / page cache

    spec = HllSpec()  # murmur3 parity mode, same as the flagship table row
    walls = []
    ready = os.path.join(args.barrier, f"ready_{args.worker}")
    for r in range(args.rounds):
        out = os.path.join(args.out, f"round_{r}")
        with open(ready + f"_{r}", "w") as fh:
            fh.write("1")
        go = os.path.join(args.barrier, f"go_{r}")
        while not os.path.exists(go):
            time.sleep(0.05)
        t0 = time.time()
        blobs = sketch_agg(df, ELEMENT, GROUPS, spec)
        blobs.write.mode("overwrite").parquet(out)
        walls.append(round(time.time() - t0, 3))
    print("RESULT " + json.dumps(
        {"worker": args.worker, "rows": rows, "walls": walls,
         "blobs": os.path.join(args.out, f"round_{args.rounds - 1}")}))
    spark.stop()


def merge_and_estimate(spark, blob_dirs: list[str]):
    from functools import reduce

    from sketchlib.spark.aggregate import (HllSpec, estimate_col,
                                           merge_partials)

    spec = HllSpec()
    parts = [spark.read.parquet(d) for d in blob_dirs]
    allb = reduce(lambda a, b: a.unionByName(b), parts)
    merged = merge_partials(allb, GROUPS, spec)
    return merged.select(*GROUPS,
                         estimate_col(spec).alias("estimate"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=24_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--files")
    ap.add_argument("--base")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--worker", type=int, default=0)
    ap.add_argument("--out")
    ap.add_argument("--barrier")
    args = ap.parse_args()
    if args.child:
        child(args)
        return 0

    from sketchlib.data.pages import write_pages_parquet

    data = os.path.join(REPO, ".benchdata", f"pages{args.rows // 1_000_000}m")
    data = write_pages_parquet(data, n_rows=args.rows, seed=42, n_days=7)

    results = {}
    for label, k, cpus in (("1x32", 1, 32), ("4x8", 4, 8)):
        work = os.path.join(REPO, ".benchdata", "multijvm", label)
        shutil.rmtree(work, ignore_errors=True)
        barrier = os.path.join(work, "barrier")
        os.makedirs(barrier, exist_ok=True)
        shards = shard_files(data, k)
        procs = []
        for i, shard in enumerate(shards):
            flist = os.path.join(work, f"files_{i}.txt")
            with open(flist, "w") as fh:
                fh.write("\n".join(shard))
            # child output goes to FILES, not pipes: an undrained PIPE
            # caps at ~64KB, and a child blocked writing Spark warnings
            # to a full pipe never reaches the barrier (deadlock)
            logf = open(os.path.join(work, f"log_{i}.txt"), "w+")
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--files", flist, "--base", data, "--cpus", str(cpus),
                 "--worker", str(i), "--out", os.path.join(work, f"w{i}"),
                 "--barrier", barrier, "--rounds", str(args.rounds)],
                stdout=logf, stderr=subprocess.STDOUT, text=True,
                env=dict(os.environ, PYTHONPATH=(
                    REPO + os.pathsep + os.environ["PYTHONPATH"]
                    if os.environ.get("PYTHONPATH") else REPO)),
                cwd=REPO))
            procs[-1]._logf = logf  # noqa: SLF001 — closed in finally
        # release each round only when every worker reports ready; on any
        # failure, kill the survivors (they would otherwise poll for a
        # go-file that never comes, leaking multi-GB JVMs)
        workers = []

        def tail(p):
            p._logf.seek(0)
            return p._logf.read()

        try:
            deadline = time.time() + 1800  # whole-config cap: a child
            for r in range(args.rounds):   # wedged mid-round (stuck Spark
                want = [os.path.join(barrier, f"ready_{i}_{r}")  # job) must
                        for i in range(k)]  # fail the bench, not hang it
                while not all(os.path.exists(p) for p in want):
                    if any(p.poll() is not None for p in procs):
                        dead = [p for p in procs if p.poll() is not None]
                        print(tail(dead[0])[-3000:], file=sys.stderr)
                        return 1
                    if time.time() > deadline:
                        print(f"barrier timeout (round {r}); worker logs "
                              f"under {work}", file=sys.stderr)
                        return 1
                    time.sleep(0.1)
                with open(os.path.join(barrier, f"go_{r}"), "w") as fh:
                    fh.write("1")
            for p in procs:
                try:
                    p.communicate(timeout=max(60, deadline - time.time()))
                except subprocess.TimeoutExpired:
                    # a child wedged in its final timed round is past the
                    # barrier loop; fail with the same diagnostics instead
                    # of a raw traceback (finally still kills survivors)
                    print(f"worker wedged after last round; log tail:\n"
                          f"{tail(p)[-3000:]}\nworker logs under {work}",
                          file=sys.stderr)
                    return 1
                out = tail(p)
                if p.returncode != 0:
                    print(out[-3000:], file=sys.stderr)
                    return 1
                line = [ln for ln in out.splitlines()
                        if ln.startswith("RESULT ")]
                workers.append(json.loads(line[0][7:]))
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                p._logf.close()
        # concurrent rounds: aggregate wall = max across workers per round
        round_walls = [max(w["walls"][r] for w in workers)
                       for r in range(args.rounds)]
        rows = sum(w["rows"] for w in workers)
        results[label] = {
            "k": k, "cpus": cpus, "rows": rows,
            "round_walls": round_walls,
            "per_worker_walls": [w["walls"] for w in workers],
            "blob_dirs": [w["blobs"] for w in workers],
        }

    # driver-side merge of the sharded partial-sketch parquet + equality check
    from scripts.bench_common import build_session, warm_up

    spark = build_session(8, app="multijvm-merge")
    # one-time JVM classloading/codegen must not be billed to the merge
    # wall (same discipline as bench.py) — the 1x32 shape never pays it
    warm_up(spark, 8)
    t0 = time.time()
    est4 = merge_and_estimate(spark, results["4x8"]["blob_dirs"])
    rows4 = {tuple(r[:2]): r[2] for r in est4.collect()}
    merge_wall = round(time.time() - t0, 3)
    est1 = merge_and_estimate(spark, results["1x32"]["blob_dirs"])
    rows1 = {tuple(r[:2]): r[2] for r in est1.collect()}
    assert rows1 == rows4, "sharded merge diverged from single-JVM result"
    spark.stop()

    n = results["4x8"]["rows"]
    best1 = min(results["1x32"]["round_walls"])
    best4 = min(results["4x8"]["round_walls"]) + merge_wall
    summary = {
        "metric": "multijvm_scaling",
        "rows": n,
        "groups": len(rows4),
        "single_jvm_local32_wall": best1,
        "single_jvm_docs_per_sec": round(n / best1, 1),
        "four_jvm_local8_wall": round(best4, 3),
        "four_jvm_merge_wall": merge_wall,
        "four_jvm_docs_per_sec": round(n / best4, 1),
        "speedup_4x8_vs_1x32": round(best1 / best4, 3),
        "round_walls": {k: v["round_walls"] for k, v in results.items()},
        "results_identical": True,
    }
    print(json.dumps(summary))
    if args.rows >= 8_000_000:  # harness-validation runs at toy scale
        write_report(summary)   # must not append junk sections to the doc
    return 0


def write_report(s: dict) -> None:
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    lines = [
        "",
        "## Multi-JVM vs single-JVM (is the 8->32 plateau a shared-JVM artifact?)",
        "",
        f"Flagship parity job (`distinct url per (lang, day)`, Murmur3 blob "
        f"parity) over the same {s['rows']:,}-row pages table, run two ways "
        "with identical total core count (32): one shared JVM vs four "
        '"executor" JVMs (subprocesses at local[8]) over disjoint '
        "size-balanced file shards, each writing per-(lang, day) partial-"
        "sketch parquet, plus a driver-side blob merge (included in the "
        "4-JVM wall). Rounds are barrier-synchronized so worker timed "
        "regions overlap, as on a real cluster; min-of-rounds reported. "
        "Merged estimates are asserted identical to the single-JVM "
        "result (register-max merge associativity).",
        "",
        "| shape | wall (s) | docs/sec |",
        "|---|---|---|",
        f"| 1 x local[32] (one shared JVM) | {s['single_jvm_local32_wall']} "
        f"| {s['single_jvm_docs_per_sec']:,.0f} |",
        f"| 4 x local[8] + blob merge ({s['four_jvm_merge_wall']} s) | "
        f"{s['four_jvm_local8_wall']} | {s['four_jvm_docs_per_sec']:,.0f} |",
        "",
        f"**4-JVM / 1-JVM throughput ratio: {s['speedup_4x8_vs_1x32']}x** "
        f"on identical hardware and core budget.",
        "",
        "_Regenerate: `python scripts/bench_multijvm.py`_",
    ]
    with open(path, "a") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    raise SystemExit(main())
