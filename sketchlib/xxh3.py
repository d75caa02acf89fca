"""Vectorized XXH3-128 (numpy) — the reference repo's default element hash.

The C# reference hashes every element with
``BitConverter.ToUInt64(System.IO.Hashing.XxHash128.Hash(x))``
(``CardinalityEstimator.cs:212-213``) and its benchmark crowns XxHash128 the
fastest option (``DifferentHashes-report-github.md``). ``XxHash128.Hash``
returns the *canonical* digest — big-endian, high64 first (xxHash spec
``XXH128_canonicalFromHash``) — and ``BitConverter.ToUInt64`` re-reads those
first 8 bytes little-endian, so the effective 64-bit value is
``byteswap64(high64(XXH3_128(x)))``. :func:`xxh128_net_flat` implements
exactly that composition; :func:`xxh3_128_flat` exposes the raw (low64,
high64) pair.

Implemented from the public xxHash v0.8 specification / reference source
(Yann Collet, BSD-2-Clause; the 192-byte default secret and the prime
constants below are published algorithm constants). Bit-exactness is pinned
by golden vectors generated from the system ``libxxhash 0.8.1`` and
cross-checked against it via ctypes in ``tests/test_hashing.py`` across all
length classes (0, 1-3, 4-8, 9-16, 17-128, 129-240, 241+).

Vectorization: inputs arrive as (flat uint8, int64 offsets) — the same
shape the Arrow hot path produces. Rows are partitioned by length class and
each class is processed with gather-based numpy (``sliding_window_view``
row gathers, 64x64->128 multiplies via 32-bit limb decomposition). The
>240-byte long path is vectorized ACROSS rows too (block/stripe loops over
all still-active rows), so hashing multi-KB text columns stays batch-wide.
Seedless variant only (seed=0) — the reference always uses the default.
"""

from __future__ import annotations

import numpy as np

_KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e"
)

_P32_1 = np.uint64(0x9E3779B1)
_P32_2 = np.uint64(0x85EBCA77)
_P32_3 = np.uint64(0xC2B2AE3D)
_P64_1 = np.uint64(0x9E3779B185EBCA87)
_P64_2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P64_3 = np.uint64(0x165667B19E3779F9)
_P64_4 = np.uint64(0x85EBCA77C2B2AE63)
_P64_5 = np.uint64(0x27D4EB2F165667C5)
_MX1 = np.uint64(0x165667919E3779F9)
_MX2 = np.uint64(0x9FB21C651E98DF25)
_M32 = np.uint64(0xFFFFFFFF)
_U64MASK = (1 << 64) - 1


def _ksec64(off: int) -> np.uint64:
    return np.uint64(int.from_bytes(_KSECRET[off:off + 8], "little"))


def _ksec32(off: int) -> np.uint64:
    return np.uint64(int.from_bytes(_KSECRET[off:off + 4], "little"))


# stripe-lane secrets: S[n, l] = sec64(8n + 8l) for stripe n, lane l
_STRIPE_SEC = np.array([[int.from_bytes(_KSECRET[8 * n + 8 * l:8 * n + 8 * l + 8],
                                        "little") for l in range(8)]
                        for n in range(16)], dtype=np.uint64)
_SCRAMBLE_SEC = np.array([int.from_bytes(_KSECRET[128 + 8 * l:136 + 8 * l],
                                         "little") for l in range(8)],
                         dtype=np.uint64)
_LASTSTRIPE_SEC = np.array([int.from_bytes(_KSECRET[121 + 8 * l:129 + 8 * l],
                                           "little") for l in range(8)],
                           dtype=np.uint64)
_INIT_ACC = np.array([int(_P32_3), int(_P64_1), int(_P64_2), int(_P64_3),
                      int(_P64_4), int(_P32_2), int(_P64_5), int(_P32_1)],
                     dtype=np.uint64)
_LANE_SWAP = np.array([1, 0, 3, 2, 5, 4, 7, 6])


def _read64(flat: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Little-endian u64 gather at byte offsets ``idx`` (flat is padded)."""
    sw = np.lib.stride_tricks.sliding_window_view(flat, 8)
    return np.ascontiguousarray(sw[idx]).view("<u8").reshape(idx.shape)


def _read32(flat: np.ndarray, idx: np.ndarray) -> np.ndarray:
    sw = np.lib.stride_tricks.sliding_window_view(flat, 4)
    return (np.ascontiguousarray(sw[idx]).view("<u4").reshape(idx.shape)
            .astype(np.uint64))




def _mul128(a: np.ndarray, b) -> tuple[np.ndarray, np.ndarray]:
    """(low64, high64) of the full 64x64 product, via 32-bit limbs."""
    a0 = a & _M32
    a1 = a >> np.uint64(32)
    b = np.asarray(b, dtype=np.uint64)
    b0 = b & _M32
    b1 = b >> np.uint64(32)
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    mid = (ll >> np.uint64(32)) + (lh & _M32) + (hl & _M32)
    lo = ((mid & _M32) << np.uint64(32)) | (ll & _M32)
    hi = a1 * b1 + (lh >> np.uint64(32)) + (hl >> np.uint64(32)) + (mid >> np.uint64(32))
    return lo, hi


def _fold64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """lo ^ hi of the 128-bit product.  The low 64 bits come from ONE
    wrapping u64 multiply (numpy's ``*`` is exactly mod-2^64), so the limb
    arithmetic only has to produce the high half and its carry — ~30%
    fewer streaming passes than reconstructing lo from limbs.  OPERANDS
    ARE TRASHED: both a and b are overwritten with limb scratch — every
    call site passes fresh ``x ^ key`` temporaries, which lets the high
    limbs live in the operand buffers (5 allocations instead of 7)."""
    lo = a * b                   # low 64 bits, exact mod 2^64
    a0 = a & _M32
    np.right_shift(a, np.uint64(32), out=a)   # a := a1 (high limb)
    b0 = b & _M32
    np.right_shift(b, np.uint64(32), out=b)   # b := b1
    ll = a0 * b0
    a0 *= b                      # lh
    b0 *= a                      # hl
    a *= b                       # a := hh (last read of b)
    ll >>= np.uint64(32)         # mid = (ll >> 32) + (lh & M32) + (hl & M32)
    t = a0 & _M32
    ll += t
    np.bitwise_and(b0, _M32, out=t)
    ll += t
    ll >>= np.uint64(32)         # carry into the high half
    a0 >>= np.uint64(32)
    b0 >>= np.uint64(32)
    a += a0
    a += b0
    a += ll                      # hi
    lo ^= a
    return lo


def _av64(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P64_2
    h = h ^ (h >> np.uint64(29))
    h = h * _P64_3
    return h ^ (h >> np.uint64(32))


def _av3(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(37))
    h = h * _MX1
    return h ^ (h >> np.uint64(32))


def _mix32_words(accl, acch, a1, b1, a2, b2, soff: int):
    accl = accl + _fold64(a1 ^ _ksec64(soff), b1 ^ _ksec64(soff + 8))
    accl = accl ^ (a2 + b2)
    acch = acch + _fold64(a2 ^ _ksec64(soff + 16), b2 ^ _ksec64(soff + 24))
    acch = acch ^ (a1 + b1)
    return accl, acch


def _mix32(accl, acch, flat, i1, i2, soff: int):
    # one fused gather for both 16-byte chunks (halves kernel launches)
    n = i1.shape[0]
    sw = np.lib.stride_tricks.sliding_window_view(flat, 16)
    pair = (np.ascontiguousarray(sw[np.concatenate([i1, i2])])
            .view("<u8").reshape(2, n, 2))
    return _mix32_words(accl, acch, pair[0, :, 0], pair[0, :, 1],
                        pair[1, :, 0], pair[1, :, 1], soff)


def _len_0(n: int) -> tuple[np.uint64, np.uint64]:
    lo = _av64(np.uint64(0) ^ _ksec64(64) ^ _ksec64(72))
    hi = _av64(np.uint64(0) ^ _ksec64(80) ^ _ksec64(88))
    return lo, hi


def _len_1to3(flat, s, ln):
    c1 = flat[s].astype(np.uint64)
    c2 = flat[s + (ln >> 1)].astype(np.uint64)
    c3 = flat[s + ln - 1].astype(np.uint64)
    lnu = ln.astype(np.uint64)
    combl = ((c1 << np.uint64(16)) | (c2 << np.uint64(24))
             | c3 | (lnu << np.uint64(8))) & _M32
    # combh = rotl32(bswap32(combl), 13)
    b0 = combl & np.uint64(0xFF)
    b1 = (combl >> np.uint64(8)) & np.uint64(0xFF)
    b2 = (combl >> np.uint64(16)) & np.uint64(0xFF)
    b3 = (combl >> np.uint64(24)) & np.uint64(0xFF)
    sw = (b0 << np.uint64(24)) | (b1 << np.uint64(16)) | (b2 << np.uint64(8)) | b3
    combh = ((sw << np.uint64(13)) | (sw >> np.uint64(19))) & _M32
    bitflipl = (_ksec32(0) ^ _ksec32(4))
    bitfliph = (_ksec32(8) ^ _ksec32(12))
    return _av64(combl ^ bitflipl), _av64(combh ^ bitfliph)


def _len_4to8(flat, s, ln):
    in_lo = _read32(flat, s)
    in_hi = _read32(flat, s + ln - 4)
    in64 = in_lo + (in_hi << np.uint64(32))
    keyed = in64 ^ (_ksec64(16) ^ _ksec64(24))
    lo, hi = _mul128(keyed, _P64_1 + (ln.astype(np.uint64) << np.uint64(2)))
    hi = hi + (lo << np.uint64(1))
    lo = lo ^ (hi >> np.uint64(3))
    lo = lo ^ (lo >> np.uint64(35))
    lo = lo * _MX2
    lo = lo ^ (lo >> np.uint64(28))
    return lo, _av3(hi)


def _len_9to16(flat, s, ln):
    bitflipl = _ksec64(32) ^ _ksec64(40)
    bitfliph = _ksec64(48) ^ _ksec64(56)
    in_lo = _read64(flat, s)
    in_hi = _read64(flat, s + ln - 8)
    lo, hi = _mul128(in_lo ^ in_hi ^ bitflipl, _P64_1)
    lo = lo + ((ln.astype(np.uint64) - np.uint64(1)) << np.uint64(54))
    in_hi = in_hi ^ bitfliph
    hi = hi + in_hi + (in_hi & _M32) * (_P32_2 - np.uint64(1))
    lo = lo ^ hi.byteswap()
    h_lo, h_hi = _mul128(lo, _P64_2)
    h_hi = h_hi + hi * _P64_2
    return _av3(h_lo), _av3(h_hi)


#: sub-class upper-bound lookup for _len_17to128: searchsorted on these
#: boundaries yields the index into _SUB_HI in ONE pass over the lengths
#: instead of the 2 compares + AND + any() per sub-class it replaced.
_SUB_BOUNDS = np.array([33, 65, 97], dtype=np.int64)
_SUB_HI = (32, 64, 96, 128)


def _len_17to128(flat, s, ln, want_lo=True):
    """Dispatches to branchless 32-byte sub-classes: within a sub-class
    every row runs the same fixed number of mix steps, so there is no
    masked fancy-indexing on mixed-length batches (the url-sized 17-32 and
    33-64 classes are the sketch hot path).  When the whole batch falls in
    one sub-class (uniform key shapes — common for url columns) the
    gather/scatter is skipped entirely."""
    n = s.shape[0]
    sid = np.searchsorted(_SUB_BOUNDS, ln, side="right")
    counts = np.bincount(sid, minlength=4)
    if (counts == n).any():
        return _len_17to128_sub(flat, s, ln,
                                _SUB_HI[int(np.argmax(counts))], want_lo)
    lo = np.empty(n, dtype=np.uint64)
    hi = np.empty(n, dtype=np.uint64)
    for k in range(4):
        if counts[k] == 0:
            continue
        sel = sid == k
        l, h = _len_17to128_sub(flat, s[sel], ln[sel], _SUB_HI[k], want_lo)
        hi[sel] = h
        if want_lo:
            lo[sel] = l
    return lo, hi


def _len_17to128_sub(flat, s, ln, hi_b, want_lo=True):
    """A sub-class with upper bound hi_b runs m = hi_b/32 mix steps; step i
    reads the forward 16-byte chunk at s+16i and the backward chunk at
    s+ln-16(i+1).  The forward chunks tile [s, s+16m) and the backward
    chunks tile [s+ln-16m, s+ln), so the whole sub-class needs exactly TWO
    contiguous block gathers (2n fancy-indexed rows instead of 2mn 16-byte
    pair rows — the gather is the kernel's dominant cost)."""
    m = hi_b // 32
    sw = np.lib.stride_tricks.sliding_window_view(flat, 16 * m)
    fw = np.ascontiguousarray(sw[s]).view("<u8").reshape(-1, 2 * m)
    bw = np.ascontiguousarray(sw[s + ln - 16 * m]).view("<u8").reshape(-1, 2 * m)
    lnu = ln.astype(np.uint64)
    accl = lnu * _P64_1
    acch = np.zeros_like(accl)
    for i in range(m - 1, -1, -1):
        a1, b1 = fw[:, 2 * i], fw[:, 2 * i + 1]
        j = 2 * (m - 1 - i)
        a2, b2 = bw[:, j], bw[:, j + 1]
        soff = 32 * i
        # in-place accumulator chain: the fold result buffer f is reused
        # as the (a+b) scratch, halving fresh temporaries per step.  (A
        # batched variant — one _fold64 over a (2m, n) operand stack —
        # was measured 12% SLOWER at every chunk size: the stacks spill
        # L2 and the spill costs more than the saved dispatch overhead.)
        f = _fold64(a1 ^ _ksec64(soff), b1 ^ _ksec64(soff + 8))
        np.add(accl, f, out=accl)
        np.add(a2, b2, out=f)
        np.bitwise_xor(accl, f, out=accl)
        f = _fold64(a2 ^ _ksec64(soff + 16), b2 ^ _ksec64(soff + 24))
        np.add(acch, f, out=acch)
        np.add(a1, b1, out=f)
        np.bitwise_xor(acch, f, out=acch)
    lo = _av3(accl + acch) if want_lo else None
    hi = np.uint64(0) - _av3(accl * _P64_1 + acch * _P64_4 + lnu * _P64_2)
    return lo, hi


def _len_129to240(flat, s, ln, want_lo=True):
    lnu = ln.astype(np.uint64)
    accl = lnu * _P64_1
    acch = np.zeros_like(accl)
    # the first four mix steps tile [s, s+128): one 128-byte block gather
    head = (np.ascontiguousarray(
        np.lib.stride_tricks.sliding_window_view(flat, 128)[s])
        .view("<u8").reshape(-1, 16))
    for i in range(4):
        accl, acch = _mix32_words(accl, acch, head[:, 4 * i],
                                  head[:, 4 * i + 1], head[:, 4 * i + 2],
                                  head[:, 4 * i + 3], 32 * i)
    accl = _av3(accl)
    acch = _av3(acch)
    for r in range(3):  # i = 160 + 32r, runs while i <= len
        m = ln >= 160 + 32 * r
        if m.any():
            sm = s[m]
            al, ah = _mix32(accl[m], acch[m], flat,
                            sm + 128 + 32 * r, sm + 144 + 32 * r, 3 + 32 * r)
            accl[m], acch[m] = al, ah
    tail = (np.ascontiguousarray(
        np.lib.stride_tricks.sliding_window_view(flat, 32)[s + ln - 32])
        .view("<u8").reshape(-1, 4))
    accl, acch = _mix32_words(accl, acch, tail[:, 2], tail[:, 3],
                              tail[:, 0], tail[:, 1], 103)
    lo = _av3(accl + acch) if want_lo else None
    hi = np.uint64(0) - _av3(accl * _P64_1 + acch * _P64_4 + lnu * _P64_2)
    return lo, hi


def _merge_accs_rows(acc: np.ndarray, soff: int, start: np.ndarray) -> np.ndarray:
    """Row-vectorized accumulator merge: acc is (R, 8), start is (R,)."""
    r = start.astype(np.uint64)
    for i in range(4):
        r = r + _fold64(acc[:, 2 * i] ^ _ksec64(soff + 16 * i),
                        acc[:, 2 * i + 1] ^ _ksec64(soff + 16 * i + 8))
    return _av3(r)


def _len_241plus(flat: np.ndarray, s: np.ndarray, ln: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """XXH3 long path (len >= 241), vectorized ACROSS rows: each loop level
    (1024-byte block, then 64-byte remainder stripe, then the overlapping
    last stripe) processes every still-active row at once, so hashing a
    column of multi-KB texts runs a handful of numpy passes per KB instead
    of a per-row Python loop."""
    n = s.shape[0]
    acc = np.tile(_INIT_ACC, (n, 1))  # (n, 8)
    block_len = 1024  # 16 stripes/block x 64 (secret 192, consume rate 8)
    nb_blocks = (ln - 1) // block_len
    maxb = int(nb_blocks.max()) if n else 0
    if maxb:
        sw = np.lib.stride_tricks.sliding_window_view(flat, block_len)
        for b in range(maxb):
            act = np.nonzero(nb_blocks > b)[0]
            idx = s[act] + b * block_len
            stripes = (np.ascontiguousarray(sw[idx]).view("<u8")
                       .reshape(-1, 16, 8))
            keys = stripes ^ _STRIPE_SEC[None, :, :]
            sub = acc[act]
            sub += stripes.sum(axis=1)[:, _LANE_SWAP]
            sub += ((keys & _M32) * (keys >> np.uint64(32))).sum(axis=1)
            sub ^= sub >> np.uint64(47)
            sub ^= _SCRAMBLE_SEC
            sub *= _P32_1
            acc[act] = sub
    nb_stripes = ((ln - 1) - block_len * nb_blocks) // 64
    a0 = s + nb_blocks * block_len
    sw64 = np.lib.stride_tricks.sliding_window_view(flat, 64)
    for st in range(15):
        act = np.nonzero(nb_stripes > st)[0]
        if act.size == 0:
            break
        stripe = (np.ascontiguousarray(sw64[a0[act] + st * 64]).view("<u8")
                  .reshape(-1, 8))
        keys = stripe ^ _STRIPE_SEC[st]
        sub = acc[act]
        sub += stripe[:, _LANE_SWAP]
        sub += (keys & _M32) * (keys >> np.uint64(32))
        acc[act] = sub
    last = np.ascontiguousarray(sw64[s + ln - 64]).view("<u8").reshape(-1, 8)
    keys = last ^ _LASTSTRIPE_SEC
    acc += last[:, _LANE_SWAP]
    acc += (keys & _M32) * (keys >> np.uint64(32))
    lnu = ln.astype(np.uint64)
    lo = _merge_accs_rows(acc, 11, lnu * _P64_1)
    hi = _merge_accs_rows(acc, 192 - 64 - 11, ~(lnu * _P64_2))
    return lo, hi


#: rows per dispatch chunk: big enough to amortize the ~50 numpy calls of
#: a class dispatch, small enough that the limb-arithmetic temporaries
#: (~8 x 8B x chunk = ~2 MB at 32k rows) stay L2-resident instead of
#: streaming DRAM (measured at 2M x 30-60B keys: 32k rows is 1.6x faster
#: than the previous 256k and 1.9x over unchunked)
_DISPATCH_CHUNK = 32768


#: length-class boundaries: searchsorted(side="right") maps a length to its
#: class id 0..6 = (0, 1-3, 4-8, 9-16, 17-128, 129-240, 241+) in ONE pass
#: over the chunk's lengths, replacing the 2 compares + AND + any() per
#: class (~18 passes) the mask table cost; bincount then both skips empty
#: classes and detects the uniform-class chunk, which runs with NO
#: gather/scatter at all (measured ~3% end-to-end on 2M ~35B urls,
#: interleaved min-of-13 against the mask dispatch).
_CLASS_BOUNDS = np.array([1, 4, 9, 17, 129, 241], dtype=np.int64)


def _dispatch(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray,
              lo: np.ndarray, hi: np.ndarray, want_lo: bool = True) -> None:
    cid = np.searchsorted(_CLASS_BOUNDS, lens, side="right")
    counts = np.bincount(cid, minlength=7)
    n = lens.shape[0]
    fns = (None, _len_1to3, _len_4to8, _len_9to16,
           _len_17to128, _len_129to240, _len_241plus)
    takes_flag = (False, False, False, False, True, True, False)
    for k in range(7):
        if counts[k] == 0:
            continue
        if k == 0:
            if counts[0] == n:
                l0, h0 = _len_0(n)
                lo[:], hi[:] = l0, h0
            else:
                m = cid == 0
                l0, h0 = _len_0(int(counts[0]))
                lo[m], hi[m] = l0, h0
            continue
        fn = fns[k]
        if counts[k] == n:
            if takes_flag[k]:
                l, h = fn(flat, starts, lens, want_lo)
            else:
                l, h = fn(flat, starts, lens)
            hi[:] = h
            if l is not None:
                lo[:] = l
        else:
            sel = cid == k
            if takes_flag[k]:
                l, h = fn(flat, starts[sel], lens[sel], want_lo)
            else:
                l, h = fn(flat, starts[sel], lens[sel])
            hi[sel] = h
            if l is not None:
                lo[sel] = l


def xxh3_128_flat(flat: np.ndarray, offsets: np.ndarray,
                  want_lo: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """(low64, high64) of seedless XXH3-128 for each row of a flattened
    byte buffer. ``offsets`` has n+1 entries (int64).  With
    ``want_lo=False`` the low64 half is skipped where it costs extra
    passes (the .NET-composition consumer only reads high64); the returned
    ``lo`` is then garbage for 17-240 byte rows."""
    flat = np.ascontiguousarray(flat, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.shape[0] - 1
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    # No tail padding needed: every gather window of width W is only built
    # when its length class is non-empty, which implies the buffer holds at
    # least one row of length >= W, and the largest gather index is always
    # offsets[-1] - W.  (A copy-pad here used to cost a full-buffer memcpy
    # + page faults per call.)
    lo = np.empty(n, dtype=np.uint64)
    hi = np.empty(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(0, n, _DISPATCH_CHUNK):
            j = min(i + _DISPATCH_CHUNK, n)
            _dispatch(flat, starts[i:j], lens[i:j], lo[i:j], hi[i:j],
                      want_lo)
    return lo, hi


def xxh128_net_flat(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """The reference repo's default element hash:
    ``BitConverter.ToUInt64(XxHash128.Hash(x))`` == byteswap64(high64)."""
    _lo, hi = xxh3_128_flat(flat, offsets, want_lo=False)
    return hi.byteswap()


def xxh128_net(data: bytes) -> int:
    flat = np.frombuffer(bytes(data), dtype=np.uint8)
    offsets = np.array([0, len(data)], dtype=np.int64)
    return int(xxh128_net_flat(flat, offsets)[0])
