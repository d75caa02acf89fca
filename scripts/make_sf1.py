"""Deterministic sf1 synthesis: 10x the driver's sf0.1 tables, written to
``.benchdata/sf1/`` for the shuffle-volume-cliff bench (BENCH/SF1.md).

The driver's testdata stops at sf0.1 and is read-only, so sf1 is derived
from sf0.1 by replication with per-replica perturbation — a pure function
of (sf0.1 bytes, replica index), no wall-clock or entropy anywhere:

* **Keys** are offset by ``replica * (max_key + 1)`` consistently across
  fact/dim tables (lineitem.l_orderkey matches orders.o_orderkey inside
  each replica, etc.), so join selectivity, per-key group sizes, and the
  join-discovery containment structure are preserved exactly.
* **Document text** keeps replica 0 verbatim; replicas 1-9 replace each
  word with probability ~0.5 by a replica-keyed token.  Any shingle
  containing a replaced word differs, so cross-replica n-gram Jaccard is
  ~0 — the near-dup pair structure inside each replica is IDENTICAL to
  sf0.1 and the total pair count scales exactly 10x (blind replication
  would have made every doc a 10-copy cluster and grown pair output
  quadratically, benching a different problem).
* **Embeddings** get a per-replica signed permutation of dimensions — an
  isometry, so within-replica distances (and thus ANN/SemDeDup cluster
  structure) are bit-preserved while cross-replica cosines decorrelate.
* ``region``/``nation`` stay as-is (fixed dimension tables).

Row counts: lineitem 6.0M, events 1.0M, orders 1.5M, documents 50k,
embeddings 20k — the 10x linear-scaling point for the expensive gates.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SF1_DST", os.path.join(REPO, ".benchdata", "sf1"))
R = int(os.environ.get("SF1_REPLICAS", "10"))


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def _write(name: str, tables: list[pa.Table]) -> None:
    out = pa.concat_tables(tables).combine_chunks()
    pq.write_table(out, os.path.join(DST, f"{name}.parquet"),
                   row_group_size=1 << 20)
    print(f"  {name}: {out.num_rows} rows")


def _offset(col: pa.ChunkedArray, r: int, span: int) -> pa.Array:
    a = col.combine_chunks().to_numpy(zero_copy_only=False)
    return pa.array(a + np.int64(r) * np.int64(span), type=col.type)


def _replicate_keys(name: str, key_spans: dict[str, int],
                    suffix_cols: tuple[str, ...] = ()) -> None:
    base = _read(name)
    reps = []
    for r in range(R):
        cols = {}
        for field in base.schema.names:
            c = base.column(field)
            if field in key_spans:
                cols[field] = _offset(c, r, key_spans[field])
            elif field in suffix_cols and r > 0:
                cols[field] = pa.array(
                    [f"{v}#r{r}" for v in c.to_pylist()], type=pa.string())
            else:
                cols[field] = c
        reps.append(pa.table(cols))
    _write(name, reps)


def _span(name: str, key: str) -> int:
    t = _read(name)
    return int(pa.compute.max(t.column(key)).as_py()) + 1


def make_documents() -> None:
    base = _read("documents").to_pandas()
    span = int(base.doc_id.max()) + 1
    reps = []
    for r in range(R):
        df = base.copy()
        df["doc_id"] = df.doc_id + r * span
        if r > 0:
            rng = np.random.default_rng(97_031 + r)
            texts = []
            for t in base.text:
                words = t.split(" ")
                keep = rng.random(len(words)) >= 0.5
                texts.append(" ".join(
                    w if k else f"w{r}q{j % 17}"
                    for j, (w, k) in enumerate(zip(words, keep))))
            df["text"] = texts
            df["n_chars"] = [len(t) for t in texts]
        reps.append(pa.Table.from_pandas(df, preserve_index=False))
    _write("documents", reps)


def make_embeddings() -> None:
    base = _read("embeddings").to_pandas()
    span = int(base.vec_id.max()) + 1
    dim = len(base.embedding.iloc[0])
    mat = np.stack(base.embedding.to_numpy()).astype(np.float32)
    reps = []
    for r in range(R):
        df = base.copy()
        df["vec_id"] = df.vec_id + r * span
        if r > 0:
            rng = np.random.default_rng(55_117 + r)
            perm = rng.permutation(dim)
            sign = rng.choice(np.float32([-1.0, 1.0]), size=dim)
            m = mat[:, perm] * sign
            df["embedding"] = list(m)
        reps.append(pa.Table.from_pandas(df, preserve_index=False))
    _write("embeddings", reps)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    print(f"sf1 synthesis: {SRC} x{R} -> {DST}")
    for name in ("region", "nation"):
        _write(name, [_read(name)])
    cust = _span("customer", "c_custkey")
    supp = _span("supplier", "s_suppkey")
    part = _span("part", "p_partkey")
    okey = _span("orders", "o_orderkey")
    user = _span("events", "user_id")
    evid = _span("events", "event_id")
    _replicate_keys("customer", {"c_custkey": cust}, ("c_name",))
    _replicate_keys("supplier", {"s_suppkey": supp}, ("s_name",))
    _replicate_keys("part", {"p_partkey": part}, ("p_name",))
    _replicate_keys("orders", {"o_orderkey": okey, "o_custkey": cust})
    _replicate_keys("lineitem", {"l_orderkey": okey, "l_partkey": part,
                                 "l_suppkey": supp})
    _replicate_keys("events", {"event_id": evid, "user_id": user})
    make_documents()
    make_embeddings()
    print("done")


if __name__ == "__main__":
    sys.exit(main())
