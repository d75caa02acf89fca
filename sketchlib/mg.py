"""Misra–Gries sketch: mergeable frequent-items summary with deterministic
undercount bounds.

The reference library answers F0 (distinct count, `CardinalityEstimator.cs`);
the frequent-items question — which keys dominate, and with what guaranteed
count — is its standard companion in the same mergeable-summaries family.
The library already surfaces heavy hitters two ways (CMS point queries +
bounded Misra–Gries *candidate* enumeration in
:mod:`sketchlib.spark.heavy_hitters`); this module adds the summary itself as
a first-class mergeable sketch, because its guarantee is the one the other
two lack: a DETERMINISTIC per-key sandwich with no failure probability and no
hash-collision overcount.

Semantics follow Misra & Gries 1982 ("Finding repeated elements") with the
mergeable formulation of Agarwal, Cormode, Huang, Phillips, Wei & Yi 2012
("Mergeable summaries", PODS; Theorem 2.1 / Section 3): a summary is at most
``k`` (key, counter) pairs plus the cumulative decrement total.  Two
summaries merge by adding counters pointwise (<= 2k pairs) and, if more than
``k`` pairs remain, subtracting the (k+1)-th largest counter value from every
pair and dropping the non-positive ones — at most k survive, and at least
k+1 counters each lost exactly that value, so the cumulative decrement
``total_decrement`` telescopes to <= n/(k+1) under ANY merge tree.  Batch
ingestion is the same operation: a batch's exact unique-counts vector is
itself an error-free summary.

Guarantees, for every key x with true frequency f(x):

* ``estimate(x) <= f(x)``                       (never overcounts)
* ``f(x) <= estimate(x) + total_decrement``      (bounded undercount)
* ``total_decrement <= count_additions/(k+1)``   (Agarwal et al. 2012)

so every key with f(x) > n/(k+1) is guaranteed present, and the stored
counter is a certified lower bound — strictly stronger than CMS (which
overcounts with probability delta) for the enumeration use-case, at the cost
of adaptivity (CMS answers point queries for keys it never stored).

Keys are the library's canonical 64-bit element hashes (same Murmur3 /
xxhash128 / FNV-1a stream as HLL/Bloom/CMS — SURVEY.md §2.6), so one
prepared hash column feeds every sketch family.  Unlike the linear sketches
the retained KEY SET is not invariant under merge order (two orders can
break decrement ties differently), so no bit-identity claim is made for the
blob; the sandwich above holds for every merge tree, which is what the gate
checks.  Serialization is canonical for a given state (keys sorted
ascending), so ``to_bytes`` is deterministic given the same merge order.
"""

from __future__ import annotations

import struct

import numpy as np

from ._wire import read_array, unpack

WIRE_MAGIC = b"FI"  # frequent items
WIRE_VERSION = 1


class MisraGriesSketch:
    """Mergeable Misra–Gries frequent-items summary over 64-bit hashes.

    ``keys`` is a sorted-ascending ``uint64`` array, ``counts`` the aligned
    positive ``int64`` counters (invariant: ``0 < len(keys) <= k`` between
    operations, keys strictly increasing).
    """

    __slots__ = ("k", "keys", "counts", "count_additions", "total_decrement")

    def __init__(self, k: int = 64, keys: np.ndarray | None = None,
                 counts: np.ndarray | None = None, count_additions: int = 0,
                 total_decrement: int = 0) -> None:
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = int(k)
        self.keys = (np.asarray(keys, dtype=np.uint64) if keys is not None
                     else np.empty(0, dtype=np.uint64))
        self.counts = (np.asarray(counts, dtype=np.int64) if counts is not None
                       else np.empty(0, dtype=np.int64))
        self.count_additions = int(count_additions)
        self.total_decrement = int(total_decrement)

    # -- ingest ----------------------------------------------------------------

    def _combine(self, keys2: np.ndarray, counts2: np.ndarray) -> None:
        """Pointwise-add an exact or MG counter vector, then reduce to k.

        The reduce subtracts the (k+1)-th largest counter from ALL counters
        and keeps the strictly positive ones: at most k survive (nothing
        <= that value stays positive), and >= k+1 counters each lose the
        full subtracted amount, which is what makes the n/(k+1) bound
        telescope (Agarwal et al. 2012, proof of Theorem 2.1).
        """
        if keys2.shape[0] == 0:
            return
        if self.keys.shape[0] == 0:
            allk, allc = keys2, counts2
        else:
            allk = np.concatenate([self.keys, keys2])
            allc = np.concatenate([self.counts, counts2])
        order = np.argsort(allk, kind="stable")
        sk = allk[order]
        sc = allc[order]
        boundary = np.empty(sk.shape[0], dtype=bool)
        boundary[0] = True
        np.not_equal(sk[1:], sk[:-1], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        keys = sk[starts]
        counts = np.add.reduceat(sc, starts)
        if keys.shape[0] > self.k:
            # (k+1)-th largest == ascending index len-k-1
            cut = int(np.partition(counts, keys.shape[0] - self.k - 1)
                      [keys.shape[0] - self.k - 1])
            counts = counts - cut
            keep = counts > 0
            keys, counts = keys[keep], counts[keep]
            self.total_decrement += cut
        self.keys = np.ascontiguousarray(keys, dtype=np.uint64)
        self.counts = np.ascontiguousarray(counts, dtype=np.int64)

    def add_hashes(self, hashes: np.ndarray,
                   weights: np.ndarray | None = None) -> None:
        """Vectorized batch add: unique-count the batch (an exact, zero-error
        summary of itself) and merge it in.  ``weights`` gives per-row
        positive integer multiplicities."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        if h.shape[0] == 0:
            return
        if weights is None:
            uniq, cnt = np.unique(h, return_counts=True)
            cnt = cnt.astype(np.int64)
            self.count_additions += int(h.shape[0])
        else:
            w = np.ascontiguousarray(weights, dtype=np.int64)
            if np.any(w < 0):
                raise ValueError("weights must be non-negative")
            uniq, inv = np.unique(h, return_inverse=True)
            # integer accumulation: float64 bincount loses exactness above
            # 2^53 per key, which would break the certified lower bound
            cnt = np.zeros(uniq.shape[0], dtype=np.int64)
            np.add.at(cnt, inv, w)
            pos = cnt > 0
            uniq, cnt = uniq[pos], cnt[pos]
            self.count_additions += int(w.sum())
        self._combine(uniq, cnt)

    # -- query -----------------------------------------------------------------

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Per-key certified lower bounds (0 for keys not retained)."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        out = np.zeros(h.shape[0], dtype=np.int64)
        if self.keys.shape[0]:
            pos = np.searchsorted(self.keys, h)
            pos = np.minimum(pos, self.keys.shape[0] - 1)
            hit = self.keys[pos] == h
            out[hit] = self.counts[pos[hit]]
        return out

    def candidates(self) -> tuple[np.ndarray, np.ndarray]:
        """(keys, lower-bound counts) sorted by count desc, key asc — every
        key with true frequency > count_additions/(k+1) is guaranteed in
        here (its counter is > 0 after all decrements)."""
        order = np.lexsort((self.keys, -self.counts))
        return self.keys[order], self.counts[order]

    def error_bound(self) -> int:
        """Max undercount of any estimate: the cumulative decrement, itself
        <= count_additions/(k+1)."""
        return self.total_decrement

    # -- merge -----------------------------------------------------------------

    def merge(self, other: "MisraGriesSketch") -> None:
        if other.k != self.k:
            raise ValueError(
                f"cannot merge Misra-Gries sketches with different k "
                f"({self.k} vs {other.k})")
        self._combine(other.keys, other.counts)
        self.count_additions += other.count_additions
        self.total_decrement += other.total_decrement

    # -- wire ------------------------------------------------------------------

    def to_bytes(self) -> bytes:
        n = int(self.keys.shape[0])
        return (WIRE_MAGIC
                + struct.pack("<BBiiqq", WIRE_VERSION, 0, self.k, n,
                              self.count_additions, self.total_decrement)
                + self.keys.astype("<u8").tobytes()
                + self.counts.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGriesSketch":
        if blob[:2] != WIRE_MAGIC:
            raise ValueError("not a Misra-Gries blob")
        if len(blob) < 2 + struct.calcsize("<BBiiqq"):
            raise ValueError("Misra-Gries blob shorter than its header")
        version, _pad, k, n, count_additions, total_decrement = unpack(
            "<BBiiqq", blob, 2, "Misra-Gries")
        if version > WIRE_VERSION:
            raise ValueError(f"incompatible Misra-Gries wire version {version}")
        if k < 1 or not 0 <= n <= k:
            raise ValueError(f"Misra-Gries parameters out of range: k={k} "
                             f"n={n}")
        off = 2 + struct.calcsize("<BBiiqq")
        if len(blob) - off != n * 16:
            raise ValueError("Misra-Gries payload length mismatch")
        keys = read_array(blob, "<u8", n, off, "Misra-Gries"
                          ).astype(np.uint64)
        counts = read_array(blob, "<i8", n, off + n * 8, "Misra-Gries"
                            ).astype(np.int64)
        # class invariants (docstring above): keys strictly increasing
        # (estimate_hashes searchsorted depends on it) and counters positive;
        # the header totals must also be plausible, or the certified
        # sandwich est <= true <= est + total_decrement is silently wrong
        if n and not bool(np.all(keys[1:] > keys[:-1])):
            raise ValueError("Misra-Gries keys not strictly increasing")
        if n and int(counts.min()) <= 0:
            raise ValueError("non-positive Misra-Gries counter")
        if count_additions < 0 or total_decrement < 0:
            raise ValueError("negative Misra-Gries totals")
        return cls(k=k, keys=keys, counts=counts,
                   count_additions=count_additions,
                   total_decrement=total_decrement)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, MisraGriesSketch):
            return NotImplemented
        return (self.k == other.k
                and bool(np.array_equal(self.keys, other.keys))
                and bool(np.array_equal(self.counts, other.counts))
                and self.count_additions == other.count_additions
                and self.total_decrement == other.total_decrement)

    __hash__ = None  # type: ignore[assignment]
