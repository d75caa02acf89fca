"""Sketch-accelerated join pruning: the explicit semi-join reduction.

The 100 TB fact–dim join problem: joining a petabyte fact table to a
selective dim subset shuffles the *whole* fact side, even though only a
small fraction of fact rows will find a partner.  Spark's own runtime
row-level Bloom pruning (``spark.sql.optimizer.runtime.bloomFilter``) only
fires under planner heuristics and can't be sized, inspected, or reused
across queries.  This module makes the reduction explicit:

1. build a Bloom filter over the dim side's join keys — one scan of the
   (small) dim table, two-stage partial-OR aggregation, blob ≤ m_bits/8
   bytes regardless of row count;
2. probe the fact side map-only against the broadcast blob *below* the
   join's Exchange, so only probe-true rows (true matches + ~fpp false
   positives) are ever shuffled;
3. run the exact join on the survivors.

Results are **exactly** those of the plain join for every supported join
type: Bloom has no false negatives, so no matching row is ever dropped,
and the exact join eliminates the false positives.  The blob is also a
reusable artifact — build it once, prune many queries against the same
dim subset (pass ``blob=``), or persist it between pipeline runs.

Join-type support (``how``):

* ``inner`` / ``left_semi`` — prune then join: probe-false fact rows
  cannot match, dropping them is free.
* ``left_anti`` — the split-union plan (same shape as
  :func:`sketchlib.dedup.incremental.drop_seen`): probe-false rows are
  *definitely absent* and bypass the join entirely; only probe-true rows
  (~|matches| + fpp·|fact|) reach the exact anti-join.  The fact side is
  scanned twice, both scans map-only.
* outer joins raise: an outer join must preserve unmatched fact rows, so
  there is nothing to prune on the fact side.

Null keys: SQL equi-joins never match NULL keys, and
:func:`~sketchlib.spark.membership.probe_might_contain` masks null-key
rows to probe-false — so they are pruned under inner/semi and kept under
anti, exactly the plain join's semantics (regression-tested).

Sizing: the default :class:`~sketchlib.spark.specs.BloomSpec` (2^20 bits,
k=7) holds ~100k keys at <1e-4 fpp.  For larger dim sides size
``m_bits ~ 14 x n_keys`` (~1% fpp at k=7); an undersized filter is still
*correct* — fpp rises toward 1 and pruning just stops paying.  Use
:func:`sketchlib.spark.skewdiag.advise_join` first if the dim side might
be big enough that broadcast-hash-joining it outright is the better plan.

No analog in the reference (membership sketches are out of its scope);
graft-mandated Bloom surface per SURVEY.md §2.6.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .membership import bloom_build_bytes, filter_might_contain
from .specs import BloomSpec

def _as_cols(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def key_bloom(dim: DataFrame, on, spec: BloomSpec | None = None) -> bytes:
    """Bloom blob over ``dim``'s join-key columns (driver-side bytes).

    One scan of dim, two-stage partial-OR aggregation — only filter blobs
    are exchanged, never rows.  The blob is what :func:`pruned_join`
    broadcasts to fact-side probe tasks; persist it to prune repeated
    queries against the same dim subset without rescanning."""
    cols = _as_cols(on)
    return bloom_build_bytes(dim.select(*cols).na.drop(subset=cols), cols,
                             spec or BloomSpec())


def pruned_join(fact: DataFrame, dim: DataFrame, on,
                how: str = "inner", *,
                blob: bytes | None = None,
                spec: BloomSpec | None = None,
                broadcast_dim: bool = False) -> DataFrame:
    """Equi-join ``fact`` to ``dim`` with the fact side Bloom-pruned
    before the shuffle.  Exact: returns precisely the plain
    ``fact.join(dim, on, how)`` rows for every supported ``how``.

    ``on`` is a column name or list of names present on BOTH sides
    (rename/alias the dim keys first — the idiomatic Spark shape).
    Pass ``blob`` (from :func:`key_bloom`) to reuse a prebuilt filter;
    otherwise one is built from ``dim`` with ``spec``.
    ``broadcast_dim=True`` additionally broadcast-hash-joins the dim side
    — the right call when dim fits in executor memory, making the whole
    plan shuffle-free."""
    spec = spec or BloomSpec()
    cols = _as_cols(on)
    hw = how.lower().replace("_", "")
    if hw not in ("inner", "leftsemi", "semi", "leftanti", "anti"):
        raise ValueError(
            f"pruned_join supports inner/left_semi/left_anti, got {how!r}: "
            "outer joins must keep unmatched fact rows, so the fact side "
            "cannot be pruned — use a plain join")
    if blob is None:
        blob = key_bloom(dim, cols, spec)
    dim_side = F.broadcast(dim) if broadcast_dim else dim
    # opaque=True pins the probe to the fact side: Catalyst's filter
    # inference would otherwise copy a deterministic probe across the
    # equi-join onto the dim side — a wasted full Python pass over it
    if hw in ("leftanti", "anti"):
        # split-union: definitely-absent rows skip the join entirely
        absent = filter_might_contain(fact, cols, blob, spec, negate=True,
                                      opaque=True)
        candidates = filter_might_contain(fact, cols, blob, spec,
                                          opaque=True)
        checked = candidates.join(dim_side, on=cols, how="left_anti")
        return absent.unionByName(checked)
    pruned = filter_might_contain(fact, cols, blob, spec, opaque=True)
    return pruned.join(dim_side, on=cols, how=how)
