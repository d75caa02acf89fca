"""Benchmark harness: runs the headline sketch queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is timed to full materialization (count + a tiny collect), after a
warm-up pass of a trivial job so JVM/Python-worker startup is not billed to
the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from scripts.bench_common import build_session, warm_up

    spark = build_session(CPUS)
    warm_up(spark, CPUS, streaming=True)

    import __spark_entry__ as entrymod

    # min of REPS runs per query: this box shows heavy hypervisor-level
    # noisy-neighbor variance (same query 2-4x slower run-to-run with the
    # VM idle), so a single sample is a lottery — the min is the honest
    # what-the-code-costs number
    REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            best = min(best, time.time() - t0)
            assert n >= 0
        timings[name] = round(best, 3)
        # operators that persist intermediates (LSH candidate sets, corpus-job
        # stage boundaries) rely on the context cleaner to reclaim blocks;
        # across 80+ back-to-back queries in one JVM those blocks accumulate
        # and late queries pay GC/memory contention that is a suite artifact,
        # not a property of the query — drop them eagerly between queries
        spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)

    # drift alarm (BENCH/REGRESSIONS.md §3): budgets are pinned at 3x a
    # measured same-code run — outside the machine's p90 noise band (1.72x),
    # far inside a real plan regression.  --write-budgets re-pins them
    # from this run after an intentional perf change.
    budget_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "budgets.json")
    if "--write-budgets" in sys.argv:
        with open(budget_path, "w") as fh:
            json.dump({k: round(v * 3, 2) for k, v in timings.items()},
                      fh, indent=1, sort_keys=True)
    try:
        with open(budget_path) as fh:
            budgets = json.load(fh)
    except (OSError, ValueError):
        # ValueError covers JSONDecodeError: a corrupt budgets file must
        # not discard a completed multi-minute suite run
        budgets = {}
    over = sorted(k for k, v in timings.items()
                  if k in budgets and v > budgets[k])
    unbudgeted = sorted(k for k in timings if k not in budgets)

    print(json.dumps({
        "metric": "sketch_query_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps_per_query": REPS,  # min-of-REPS (hypervisor noise mitigation)
        "n_queries": len(timings),  # suite GREW across rounds: compare
        "sec_per_query": round(total / max(len(timings), 1), 3),  # per-query,
        "sf": _sf_from_dir(SF_DIR),  # not total wall, across rounds
        "cpus": int(CPUS),
        "over_budget": over,  # gates past 3x their pinned same-code wall
        "unbudgeted": unbudgeted,  # new gates awaiting a budget pin
    }))
    spark.stop()


if __name__ == "__main__":
    main()
