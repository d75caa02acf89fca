"""Isolated re-measure of suite-bench outliers (VERDICT r4 'next' #2).

Each named gate runs in its OWN fresh JVM (one subprocess per gate) at the
bench config (local[32], sf0.1), with the same warm-up bench.py uses, then
N timed runs; we report min / median.  This separates real per-operator
regressions from suite-level contention (94 queries sharing one JVM) and
VM noise.

Usage:
    python scripts/bench_regressions.py [gate ...]   # default: the r4 six
    python scripts/bench_regressions.py --runs 5
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

DEFAULT_GATES = [
    "simhash_near_dup_pairs",
    "embedding_near_dup",
    "hash_split_stable",
    "cms_heavy_hitters_suppliers",
    "gopher_quality",
    "streaming_ddsketch_median",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from scripts.bench_common import build_session, warm_up

spark = build_session(32, app="bench-regressions")
warm_up(spark, 32)

import __spark_entry__ as entrymod
fn = entrymod.queries()[{gate!r}]
times = []
for _ in range({runs}):
    t0 = time.time()
    df = fn(spark, {sf_dir!r})
    df.count()
    df.limit(5).collect()
    times.append(time.time() - t0)
print("RESULT " + json.dumps(times))
"""


def main() -> int:
    runs = 5
    argv = list(sys.argv[1:])
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i:i + 2]
    gates = [a for a in argv if not a.startswith("--")] or DEFAULT_GATES
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = {}
    for gate in gates:
        code = CHILD.format(repo=repo, gate=gate, runs=runs, sf_dir=sf_dir)
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=900)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"{gate}: FAILED\n{proc.stderr[-2000:]}")
            return 1
        times = json.loads(line[0][7:])
        out[gate] = {"min": round(min(times), 3),
                     "median": round(statistics.median(times), 3),
                     "max": round(max(times), 3),
                     "runs": [round(t, 3) for t in times]}
        print(f"{gate}: min={out[gate]['min']}s median={out[gate]['median']}s "
              f"max={out[gate]['max']}s (fresh JVM, {runs} runs)")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
