"""Cuckoo filter: set-membership sketch that supports DELETION.

The reference library has no membership sketch at all (SURVEY.md §2.6 adds
Bloom as the graft-mandated sibling); the cuckoo filter (Fan, Andersen,
Kaminsky, Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014) is the deletable complement: a Bloom filter cannot unset a bit
without corrupting other elements, while a cuckoo filter stores discrete
per-element fingerprints that can be removed one copy at a time.  In a
training-data pipeline this is the retract path for incremental URL dedup —
a recrawled page whose old copy was withdrawn can be deleted from the seen
filter instead of forcing a full rebuild (``dedup/incremental.py`` carries
the insert-only Bloom variant).

Construction (paper §3): ``nb`` buckets of ``SLOTS = 4`` 16-bit
fingerprints; an element's fingerprint is the top 16 hash bits (forced
nonzero — zero is the empty-slot sentinel), its first bucket is the low
hash bits, and its alternate bucket is ``i XOR mix(fp)`` (partial-key
cuckoo hashing, an involution, so the alternate of the alternate is the
original and relocation never needs the original key).  Insertion evicts a
resident fingerprint to its own alternate bucket when both candidate
buckets are full (bounded random-walk; deterministic victim rotation here
so single-threaded builds are reproducible).

Batch shape: inserts place an entire batch with TWO vectorized
rank-vs-free-slot rounds (first-choice buckets, then alternates) and fall
back to the scalar eviction walk only for rows whose both buckets filled up
— at the 84 % default sizing the scalar tail is a fraction of a percent of
rows.  Buckets keep their occupied slots prefix-packed (deletes compact by
swapping the last occupied slot into the hole) so a bucket's free capacity
is a single ``occ`` lookup, not a slot scan.

Guarantees (and the sharp edges, paper §3.2): an inserted-and-not-deleted
element is ALWAYS found (no false negatives); lookups of absent elements
hit with probability ~``2·SLOTS/2^16`` ≈ 1.2e-4.  Deletion carries the
paper's standing caveat: delete only elements you know were inserted — a
delete of a never-inserted element usually reports ``False`` harmlessly,
but with probability ~fpr it collides with a stored element's
(fingerprint, bucket-pair) and removes THAT element's copy, creating a
false negative.  Duplicate inserts store at most
``DUP_CAP = 2`` copies per (fingerprint, bucket-pair) — the pair they are
permanently confined to — so duplicate-heavy columns cannot saturate a
closed bucket chain and wedge the eviction walk, while one delete stays
safe under a fingerprint collision (the reason cuckoo filters store
duplicates at all).  Callers doing distributed builds should pre-dedup the
insert side (``hash_dedup`` stage-1 dedup is per-partition only) if they
need exact one-delete-removes-membership semantics.  Merge = re-insert the other filter's fingerprints (associative
and commutative at the SET level; the byte layout is merge-order dependent,
like Misra–Gries — the property tests assert the set guarantee, not bit
equality).  Merging can raise if the union genuinely exceeds capacity;
partial state is never published (inserts go to a scratch copy first).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ._wire import read_array, unpack

WIRE_MAGIC = b"CK"
WIRE_VERSION = 1

SLOTS = 4
MAX_KICKS = 500
DUP_CAP = 2  # stored copies per (fingerprint, bucket pair) — see _bulk_insert

_GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)
_M16 = np.uint64(0xFFFF)


def _fp_mix(fp: np.ndarray) -> np.ndarray:
    """64-bit mix of a 16-bit fingerprint for the alternate-bucket offset.

    One multiply-shift round is enough: the offset only needs to spread 16
    bits of entropy over ``log2(nb)`` bits, and the xor-involution does not
    care how strong the mixer is, only that it is a pure function of fp."""
    k = fp.astype(np.uint64) * _GOLDEN64
    return k >> np.uint64(24)


def optimal_params(expected_n: int, load: float = 0.84) -> int:
    """Bucket count (power of two) sized so ``expected_n`` fingerprints fill
    at most ``load`` of the table.  Fan et al. table 2: bucket size 4
    sustains 95 % occupancy w.h.p.; the 84 % default leaves eviction
    headroom for merge-order variance in distributed builds."""
    if not 0.05 <= load <= 0.95:
        raise ValueError(f"load must be in [0.05, 0.95], got {load}")
    nb = max(8, int(math.ceil(expected_n / (SLOTS * load))))
    return 1 << (nb - 1).bit_length()


class CuckooFilter:
    """Mergeable, deletable membership filter over 64-bit element hashes.

    ``n_buckets`` must be a power of two (mask reduction).  State is a
    ``uint16[n_buckets, 4]`` fingerprint table (0 = empty) plus its
    derived per-bucket occupancy; all bulk operations are vectorized
    numpy with a scalar eviction walk only for overflow rows.
    """

    __slots__ = ("n_buckets", "buckets", "occ", "count_additions", "_kick")

    def __init__(self, n_buckets: int = 1 << 16,
                 buckets: np.ndarray | None = None,
                 count_additions: int = 0) -> None:
        if n_buckets < 8 or n_buckets & (n_buckets - 1):
            raise ValueError(
                f"n_buckets must be a power of two >= 8, got {n_buckets}")
        self.n_buckets = n_buckets
        if buckets is None:
            buckets = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        # prefix-packed invariant: occupied slots of a bucket are exactly
        # [0, occ) — ESTABLISHED here for any caller-supplied array (a
        # non-packed table would desync occ from slot positions: inserts
        # would overwrite live fingerprints and compaction would swap the
        # wrong slot), preserved thereafter by insert/delete compaction
        if (buckets[:, :-1][(buckets[:, :-1] == 0)
                            & (buckets[:, 1:] != 0)].shape[0]):
            order = np.argsort(buckets == 0, axis=1, kind="stable")
            buckets = np.take_along_axis(buckets, order, axis=1)
        self.buckets = buckets
        self.occ = (buckets != 0).sum(axis=1).astype(np.int64)
        self.count_additions = count_additions
        self._kick = 0

    # -- hash -> (fp, bucket, alt bucket) ---------------------------------

    def _decompose(self, hashes: np.ndarray):
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty sentinel
        mask = np.int64(self.n_buckets - 1)
        b1 = (h & np.uint64(self.n_buckets - 1)).astype(np.int64)
        b2 = b1 ^ (_fp_mix(fp).astype(np.int64) & mask)
        return fp, b1, b2

    def _alt(self, fp: np.ndarray, b: np.ndarray) -> np.ndarray:
        mask = np.int64(self.n_buckets - 1)
        return b ^ (_fp_mix(fp).astype(np.int64) & mask)

    # -- insert -----------------------------------------------------------

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Insert a batch.  Duplicates are stored as extra copies up to
        ``DUP_CAP`` per (fingerprint, bucket-pair); copies past the cap are
        dropped (membership unaffected — see the module docstring).
        Raises ValueError if the table is genuinely over capacity; the
        filter is left unchanged on failure (scratch-copy publish)."""
        h = np.asarray(hashes)
        if h.shape[0] == 0:
            return
        fp, b1, b2 = self._decompose(h)
        buckets, occ = self.buckets.copy(), self.occ.copy()
        kick = self._bulk_insert(buckets, occ, fp, b1, b2, self._kick)
        self.buckets, self.occ, self._kick = buckets, occ, kick
        # lineage semantics: ROWS OFFERED (including cap-dropped duplicate
        # copies — those rows were ingested and are represented for
        # membership) minus stored copies later removed by delete_hashes.
        # On an add-only build this is exactly the input row count (what
        # checkpoint lineage wants); after deletes of duplicate-heavy keys
        # it can exceed size() — use size() for live stored fingerprints.
        self.count_additions += int(h.shape[0])

    def _bulk_insert(self, buckets: np.ndarray, occ: np.ndarray,
                     fp: np.ndarray, b1: np.ndarray, b2: np.ndarray,
                     kick: int) -> int:
        cur, alt = b1, b2
        # Duplicate cap: at most DUP_CAP copies of one fingerprint per
        # bucket pair.  An element is CLOSED in its pair — relocation can
        # never move it out of {cur, alt} — so unbounded duplicates from
        # hot keys (a fact-table foreign key, N partial filters of one
        # popular url) pile into closed bucket CHAINS (pairs linked by
        # shared buckets) until a chain saturates and the eviction walk
        # cycles forever.  Two copies is the sweet spot: it keeps one
        # delete safe under a fingerprint collision (the reason cuckoo
        # filters store duplicates at all, Fan et al. §3.2) while bounding
        # a chain's closed population to 2 per distinct fingerprint, which
        # cannot saturate 4 slots/bucket outside astronomically unlikely
        # multi-fp collisions (those still raise at MAX_KICKS).  Dropped
        # copies never affect membership (>=1 copy stays); deletes account
        # for STORED copies.
        stored = ((buckets[cur] == fp[:, None]).sum(axis=1)
                  + (buckets[alt] == fp[:, None]).sum(axis=1))
        degenerate = cur == alt  # both lookups scanned the same bucket
        stored = np.where(degenerate, stored >> 1, stored)
        # drop already-capped rows BEFORE the rank sort: in steady-state
        # distributed merges most incoming copies are duplicates of stored
        # fingerprints, and the argsort is the dominant cost of this block
        pre = stored < DUP_CAP
        if not pre.all():
            if not pre.any():
                return kick
            fp, cur, alt, stored = fp[pre], cur[pre], alt[pre], stored[pre]
        pair_key = (np.minimum(cur, alt).astype(np.uint64)
                    << np.uint64(16)) | fp
        order = np.argsort(pair_key, kind="stable")
        sk = pair_key[order]
        first = np.empty(sk.shape[0], dtype=bool)
        first[0] = True
        np.not_equal(sk[1:], sk[:-1], out=first[1:])
        grp_start = np.flatnonzero(first)
        rank = (np.arange(sk.shape[0], dtype=np.int64)
                - grp_start[np.cumsum(first) - 1])
        keep = np.empty(sk.shape[0], dtype=bool)
        keep[order] = rank + stored[order] < DUP_CAP
        if not keep.all():
            fp, cur, alt = fp[keep], cur[keep], alt[keep]
            if fp.shape[0] == 0:
                return kick
        for _round in range(2):
            placed = self._place_round(buckets, occ, fp, cur)
            if placed.all():
                return kick
            fp, cur, alt = fp[~placed], alt[~placed], cur[~placed]
        for j in range(fp.shape[0]):  # rare at sane load factors
            kick = self._insert_one(buckets, occ, int(fp[j]), int(cur[j]),
                                    kick)
        return kick

    @staticmethod
    def _place_round(buckets: np.ndarray, occ: np.ndarray,
                     fp: np.ndarray, cur: np.ndarray) -> np.ndarray:
        """Place each row into its ``cur`` bucket if a slot is free; returns
        the placed mask.  Rank-within-bucket vs free-capacity, two sorts,
        no Python loop."""
        order = np.argsort(cur, kind="stable")
        sc = cur[order]
        first = np.empty(sc.shape[0], dtype=bool)
        first[0] = True
        np.not_equal(sc[1:], sc[:-1], out=first[1:])
        grp_id = np.cumsum(first) - 1
        grp_start = np.flatnonzero(first)
        rank = np.arange(sc.shape[0], dtype=np.int64) - grp_start[grp_id]
        free = SLOTS - occ[sc]
        take = rank < free
        slots = occ[sc[take]] + rank[take]
        buckets[sc[take], slots] = fp[order][take]
        ub, cnt = np.unique(sc[take], return_counts=True)
        occ[ub] += cnt
        placed = np.zeros(sc.shape[0], dtype=bool)
        placed[order] = take
        return placed

    def _insert_one(self, buckets: np.ndarray, occ: np.ndarray,
                    fp: int, b: int, kick: int) -> int:
        """Scalar cuckoo walk: evict a resident to its alternate bucket
        until a slot frees up.  The victim slot comes from the HIGH bits of
        an LCG step over the kick counter — deterministic, but decorrelated
        from the walk's cycle structure.  (``kick % SLOTS`` is a trap: a
        2-bucket bounce advances kick by 2 per revisit, so each bucket only
        ever offers the same parity class of slots and a bucket pair full
        of one fingerprint's copies can cycle forever even though evicting
        the OTHER resident would escape immediately.)"""
        cur_fp = int(fp)
        cur_b = int(b)
        mask = self.n_buckets - 1
        for _ in range(MAX_KICKS):
            if occ[cur_b] < SLOTS:
                buckets[cur_b, occ[cur_b]] = cur_fp
                occ[cur_b] += 1
                return kick
            kick += 1
            victim = (((kick * 6364136223846793005 + 1442695040888963407)
                       & 0xFFFFFFFFFFFFFFFF) >> 32) % SLOTS
            resident = int(buckets[cur_b, victim])
            buckets[cur_b, victim] = cur_fp
            cur_fp = resident
            # scalar _alt: python-int arithmetic, no per-kick numpy allocs
            cur_b ^= (((cur_fp * 0x9E3779B97F4A7C15)
                       & 0xFFFFFFFFFFFFFFFF) >> 24) & mask
        raise ValueError(
            "cuckoo filter over capacity: eviction walk exceeded "
            f"{MAX_KICKS} kicks at "
            f"{occ.sum() / (occ.shape[0] * SLOTS):.2f} load; "
            "size with optimal_params(expected_n) or lower the load")

    # -- lookup / delete --------------------------------------------------

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = probably present, False =
        definitely absent (no false negatives for live insertions)."""
        h = np.asarray(hashes)
        if h.shape[0] == 0:
            return np.zeros(0, dtype=bool)
        fp, b1, b2 = self._decompose(h)
        fcol = fp[:, None]
        return ((self.buckets[b1] == fcol).any(axis=1)
                | (self.buckets[b2] == fcol).any(axis=1))

    def delete_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE stored copy per row; returns the per-row removed
        mask (False = no matching fingerprint was present).  Delete only
        elements known to be inserted: a never-inserted row usually
        reports False harmlessly, but at ~fpr its fingerprint collides
        with a stored element's and removes that element's copy (module
        docstring, paper §3.2).

        Batch-safe under contention: rows that race for the same bucket
        retry in the next pass (at most one removal per bucket per pass
        keeps the swap-last-into-hole compaction race-free), so ``n``
        deletes of ``n`` stored copies all succeed in one call."""
        h = np.asarray(hashes)
        if h.shape[0] == 0:
            return np.zeros(0, dtype=bool)
        fp, b1, b2 = self._decompose(h)
        removed = np.zeros(h.shape[0], dtype=bool)
        pending = np.arange(h.shape[0])
        while pending.shape[0]:
            pfp, pb1, pb2 = fp[pending], b1[pending], b2[pending]
            fcol = pfp[:, None]
            m1 = self.buckets[pb1] == fcol
            m2 = self.buckets[pb2] == fcol
            in1 = m1.any(axis=1)
            in2 = ~in1 & m2.any(axis=1)
            tgt_b = np.where(in1, pb1, pb2)
            tgt_s = np.where(in1, m1.argmax(axis=1), m2.argmax(axis=1))
            found = in1 | in2
            if not found.any():
                break
            fi = np.flatnonzero(found)
            # one delete per bucket per pass: contenders retry
            _, first_idx = np.unique(tgt_b[fi], return_index=True)
            win = fi[first_idx]
            wb, ws = tgt_b[win], tgt_s[win]
            last = self.occ[wb] - 1
            self.buckets[wb, ws] = self.buckets[wb, last]
            self.buckets[wb, last] = 0
            self.occ[wb] = last
            # clamped at 0: count_additions is "rows offered minus copies
            # removed" (see add_hashes) and deserialized/rebuilt filters
            # may carry a caller-supplied count smaller than stored copies
            self.count_additions = max(0, self.count_additions - int(win.shape[0]))
            removed[pending[win]] = True
            # rows still unresolved = found contenders that lost the race
            lost = np.setdiff1d(fi, win, assume_unique=True)
            pending = pending[lost]
        return removed

    # -- merge / stats / wire ---------------------------------------------

    def merge(self, other: "CuckooFilter") -> None:
        """Re-insert the other filter's fingerprints (set-associative,
        set-commutative).  All-or-nothing: on capacity failure this filter
        is unchanged."""
        if other.n_buckets != self.n_buckets:
            raise ValueError(
                "cannot merge cuckoo filters with different bucket counts")
        if not self.occ.any():  # empty self: adopt the other's layout
            self.buckets = other.buckets.copy()
            self.occ = other.occ.copy()
            self.count_additions += other.count_additions
            return
        nz_b, nz_s = np.nonzero(other.buckets)
        if nz_b.shape[0]:
            ofp = other.buckets[nz_b, nz_s]
            cur = nz_b.astype(np.int64)
            alt = self._alt(ofp, cur)
            buckets, occ = self.buckets.copy(), self.occ.copy()
            kick = self._bulk_insert(buckets, occ, ofp, cur, alt, self._kick)
            self.buckets, self.occ, self._kick = buckets, occ, kick
        self.count_additions += other.count_additions

    def size(self) -> int:
        """Stored fingerprints: distinct-insert count when the insert side
        was pre-deduped; duplicate copies past ``DUP_CAP`` are dropped, so
        on a non-distinct stream this is neither a multiset count nor a
        distinct count — use HLL/Theta for cardinality."""
        return int(self.occ.sum())

    def load_factor(self) -> float:
        return self.size() / (self.n_buckets * SLOTS)

    def fpr(self) -> float:
        """Absent-element hit probability at the current occupancy: each of
        the up-to-``2·SLOTS`` visible slots matches a random 16-bit
        fingerprint with p = 2^-16, scaled by the actual fill."""
        return 1.0 - (1.0 - 1.0 / 65536.0) ** (2 * SLOTS * max(
            self.load_factor(), 1e-12))

    def to_bytes(self) -> bytes:
        return (WIRE_MAGIC
                + struct.pack("<BBiiq", WIRE_VERSION, 0,
                              self.n_buckets.bit_length() - 1, SLOTS,
                              self.count_additions)
                + self.buckets.astype("<u2", copy=False).tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        if blob[:2] != WIRE_MAGIC:
            raise ValueError("not a cuckoo filter blob")
        version, _pad, log_nb, slots, count_additions = unpack(
            "<BBiiq", blob, 2, "Cuckoo")
        if version > WIRE_VERSION:
            raise ValueError(f"incompatible Cuckoo wire version {version}")
        if not 3 <= log_nb <= 40 or slots != SLOTS:
            raise ValueError("invalid Cuckoo parameters")
        nb = 1 << log_nb
        off = 2 + struct.calcsize("<BBiiq")
        if len(blob) - off != nb * SLOTS * 2:
            raise ValueError("Cuckoo payload length mismatch")
        raw = read_array(blob, "<u2", nb * SLOTS, off, "Cuckoo")
        buckets = np.ascontiguousarray(raw).astype(np.uint16).reshape(
            nb, SLOTS)
        # the constructor re-establishes the prefix-packed invariant for
        # blobs produced by foreign writers (empty-last stable sort)
        return cls(n_buckets=nb, buckets=buckets, count_additions=count_additions)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, CuckooFilter):
            return NotImplemented
        return (self.n_buckets == other.n_buckets
                and bool(np.array_equal(self.buckets, other.buckets))
                and self.count_additions == other.count_additions)

    __hash__ = None  # type: ignore[assignment]
