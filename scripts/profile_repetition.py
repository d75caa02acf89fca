"""Stage-level timing of the repetition_stats numpy kernel on real pages
text (driver-side, one batch, no Spark) — identifies where the per-batch
time goes before optimizing.  Usage:
    python scripts/profile_repetition.py [--rows 200000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.path.join(REPO, ".benchdata", "pages"))
    ap.add_argument("--rows", type=int, default=200000)
    args = ap.parse_args()

    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    import sketchlib.text.repetition as R

    t0 = time.time()
    tbl = (ds.dataset(args.data).head(args.rows, columns=["text"]))
    texts = tbl.column("text")
    # replicate the JVM-side prep: lower, trim, split on \s+
    lowered = pc.utf8_lower(pc.utf8_trim_whitespace(texts))
    toks = pc.split_pattern_regex(lowered, r"\s+").combine_chunks()
    if hasattr(toks, "chunk"):
        toks = toks.chunk(0) if toks.num_chunks else toks.combine_chunks()
    ncs = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(toks)
    print(f"load+tokenize {time.time()-t0:.2f}s rows={n} "
          f"tokens={pc.sum(pc.list_value_length(toks)).as_py()}")

    # warm
    R._batch_stats(n, ncs, toks)

    t = time.time()
    R._batch_stats(n, ncs, toks)
    full = time.time() - t
    print(f"_batch_stats: {full:.3f}s  ({n/full/1000:.1f}k docs/s)")

    # stage timings (mirrors _batch_stats structure)
    lens = (pc.fill_null(pc.list_value_length(toks), 0)
            .to_numpy(zero_copy_only=False).astype(np.int64))
    flat = pc.list_flatten(toks)
    total = len(flat)
    T = {}

    t = time.time(); tid, rank_sp, rank_raw, L = R._token_ids_and_ranks(flat)
    T["token_ids_and_ranks"] = time.time() - t

    t = time.time()
    cumL = np.zeros(total + 1, dtype=np.int64); np.cumsum(L, out=cumL[1:])
    did = np.repeat(np.arange(n, dtype=np.int64), lens)
    T["did_repeat"] = time.time() - t

    t = time.time(); p2 = np.nonzero(did[:-1] == did[1:])[0]
    T["p2_positions"] = time.time() - t
    d2 = did[p2]

    t = time.time()
    ordp = (rank_sp[tid[p2]] << R._U32) | rank_raw[tid[p2 + 1]]
    seg = R._doc_segments(d2)
    seg_sizes = np.diff(np.append(seg, d2.size))
    minord = np.minimum.reduceat(ordp, seg)
    hit = ordp == np.repeat(minord, seg_sizes)
    T["2g_minreduce"] = time.time() - t

    t = time.time(); gh = R._GramHasher(tid)
    T["gram_hasher_init"] = time.time() - t
    t = time.time(); h2 = R._mix2(d2.astype(np.uint64), gh.gram_hash(p2, 2))
    T["2g_mixfold"] = time.time() - t
    t = time.time(); dv2 = R._dup_values(h2)
    T["2g_dupvalues(sort)"] = time.time() - t
    t = time.time(); cm2 = R._member(h2, dv2)
    T["2g_member"] = time.time() - t
    print(f"  2g candidates: {int(cm2.sum())} of {p2.size}")

    t = time.time(); p5 = np.nonzero(did[:-4] == did[4:])[0]
    T["p5_positions"] = time.time() - t
    d5 = did[p5]
    t = time.time()
    h5 = R._mix2(d5.astype(np.uint64), gh.gram_hash(p5, 5))
    T["5g_mixfold"] = time.time() - t
    t = time.time(); dv5 = R._dup_values(h5)
    T["5g_dupvalues(sort)"] = time.time() - t
    t = time.time(); cm5 = R._member(h5, dv5)
    T["5g_member"] = time.time() - t
    print(f"  5g candidates: {int(cm5.sum())} of {p5.size}")

    if cm5.any():
        t = time.time()
        c, dc = p5[cm5], d5[cm5].astype(np.uint64)
        fa, _ = R._factorize((tid[c] << R._U32) | tid[c + 1])
        fb, _ = R._factorize((tid[c + 2] << R._U32) | tid[c + 3])
        f4, _ = R._factorize((fa.astype(np.uint64) << R._U32)
                             | fb.astype(np.uint64))
        f5, _ = R._factorize((f4.astype(np.uint64) << R._U32) | tid[c + 4])
        T["5g_exact_count"] = time.time() - t

    tot = sum(T.values())
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:22s} {v:7.3f}s  {100*v/tot:5.1f}%")
    print(f"  staged-total {tot:.3f}s vs full {full:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
