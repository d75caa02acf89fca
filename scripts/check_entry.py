"""Local mimic of the driver's correctness gate: run every __spark_entry__
query at sf0.01 and compare row-count / schema / order-insensitive value hash
against the DuckDB oracle."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def window_audit(window: int = 50, max_stale_rounds: int = 2) -> int:
    """Rotation-debt audit (no Spark): every registry gate must have a green
    driver CORRECTNESS row within the last ``max_stale_rounds`` rounds OR sit
    inside the first ``window`` registry positions (so it gets one this
    round).  Returns the number of debt violations; prints the ledger."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for gate, rec in data.items():
            green = (rec.get("rows_match") and rec.get("schema_match")
                     and rec.get("hash_match") and not rec.get("err"))
            if green:
                rounds[gate] = max(rounds.get(gate, 0), rnd)
    latest = max(rounds.values(), default=0)
    names = list(entrymod.queries())
    in_window = set(names[:window])
    debt = []
    for i, name in enumerate(names):
        last = rounds.get(name)
        stale = latest - last if last else None
        covered = name in in_window or (last and stale < max_stale_rounds)
        mark = "ok" if covered else "DEBT"
        pos = "win" if name in in_window else f"p{i + 1}"
        print(f"{mark:4s} {name:40s} {pos:5s} last_green="
              f"{'r%02d' % last if last else 'never'}")
        if not covered:
            debt.append(name)
    print(f"window_audit: {len(names)} gates, {len(debt)} rotation-debt "
          f"violations (window={window}, max_stale={max_stale_rounds}, "
          f"latest_round=r{latest:02d})")
    if debt:
        print("rotate these into the window:", debt)
    return len(debt)


def main() -> int:
    if "--window" in sys.argv:
        i = sys.argv.index("--window")
        window = 50
        if len(sys.argv) > i + 1:
            try:
                window = int(sys.argv[i + 1])
            except ValueError:
                print(f"--window expects an integer width, got "
                      f"{sys.argv[i + 1]!r} (gate-name filters are "
                      "positional args WITHOUT --window)", file=sys.stderr)
                return 2
        return window_audit(window)
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    only = set(sys.argv[1:])  # optional: check just the named queries
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        got = fn(spark, SF_DIR).toPandas()
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(got)} (no oracle, rows-only) [{dt:.1f}s]")
            if len(got) == 0:
                failures += 1
            continue
        want = con.sql(oracles[name]).df()
        g, w = canon(got), canon(want)
        ok_rows = len(g) == len(w)
        ok_cols = list(g.columns) == list(w.columns)
        if ok_cols:
            gt = [str(got[sorted(got.columns)].dtypes[c]) for c in g.columns]
            wt = [str(want[sorted(want.columns)].dtypes[c]) for c in w.columns]
            if gt != wt:
                print(f"{name}: DTYPE MISMATCH spark={gt} duckdb={wt}")
                failures += 1
        ok_vals = ok_rows and ok_cols and g.astype(str).equals(w.astype(str))
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name}: {status} rows {len(g)}/{len(w)} cols {list(g.columns)}/{list(w.columns)} [{dt:.1f}s]")
            if ok_rows and ok_cols:
                diff = g.astype(str).compare(w.astype(str))
                print(diff.head(10))
        else:
            print(f"{name}: OK rows={len(g)} [{dt:.1f}s]")
    ent = entrymod.entry(spark)
    n = ent.count()
    print(f"entry(): rows={n} schema={ent.schema.simpleString()}")
    if n <= 0:
        failures += 1
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
