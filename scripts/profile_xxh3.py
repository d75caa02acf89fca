"""cProfile + stage timing for the xxh3 url hot path (17-64 byte keys).
Usage: python scripts/profile_xxh3.py
"""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sketchlib.hashing import HASHES, to_flat_bytes  # noqa: E402
from sketchlib import xxh3  # noqa: E402


def main():
    n = 2_000_000
    vals = [f"https://h{i % 997}.example.com/p/{i}".encode() for i in range(n)]
    flat, offsets = to_flat_bytes(vals)
    fn = HASHES["xxhash128"][1]
    fn(flat[: offsets[1000] + 16], offsets[:1000])  # warm
    best = min(
        (lambda t0: (fn(flat, offsets), time.time() - t0)[1])(time.time())
        for _ in range(5))
    print(f"xxh3_128_flat: {best:.3f}s  {n/best/1e6:.2f}M keys/s")

    pr = cProfile.Profile()
    pr.enable()
    fn(flat, offsets)
    pr.disable()
    pstats.Stats(pr).sort_stats("cumulative").print_stats(18)

    # isolate the gather cost for the 17-32 class
    lens = np.diff(offsets)
    s = offsets[:-1][(lens >= 17) & (lens <= 32)]
    ln = lens[(lens >= 17) & (lens <= 32)]
    print(f"17-32 rows: {s.size}")
    t = time.time()
    sw = np.lib.stride_tricks.sliding_window_view(flat, 16)
    fw = np.ascontiguousarray(sw[s]).view("<u8").reshape(-1, 2)
    bw = np.ascontiguousarray(sw[s + ln - 16]).view("<u8").reshape(-1, 2)
    print(f"two 16B gathers: {time.time()-t:.3f}s")
    t = time.time()
    l, h = xxh3._len_17to128_sub(flat, s, ln, 32)
    print(f"full 17-32 subclass: {time.time()-t:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
