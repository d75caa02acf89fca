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


def main() -> int:
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
