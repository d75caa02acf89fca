"""Bloom-filter membership operators: build a filter per group, probe a
column against it (url-dedup / anti-join pre-filter — SURVEY.md §2.6).

At 100 TB the pattern is: build the filter over the small(er) side with the
two-stage aggregation, then ship the blob to every probe task (closure
capture ~ broadcast; a 1M-bit filter is 128 KB) and filter the big side
*before* any shuffle — the classic semi-join reduction. No false negatives:
a row filtered out definitely does not match.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .aggregate import hash_columns, sketch_agg
# broadcast reuse, worker dedup cache, and typed null fillers are shared
# probe infrastructure (heavy_hitters uses them too) — see blobcache
from .blobcache import blob_digest, blob_token, broadcast_blob, col_type
from .blobcache import get_or_load, zero_lit
from .specs import BloomSpec, CuckooSpec

# compatibility aliases for the old private names
_broadcast_blob = broadcast_blob
_zero_lit = zero_lit


def bloom_build(df: DataFrame, element_cols, group_cols: Sequence[str] = (),
                spec: BloomSpec | None = None) -> DataFrame:
    """One Bloom filter blob per group (two-stage: partial OR-merge)."""
    return sketch_agg(df, element_cols, group_cols, spec or BloomSpec())


def bloom_build_bytes(df: DataFrame, element_cols,
                      spec: BloomSpec | None = None) -> bytes:
    """Global filter as raw bytes (driver-side), for probing other frames."""
    [row] = bloom_build(df, element_cols, (), spec).collect()
    return bytes(row["sketch"])


def cuckoo_build(df: DataFrame, element_cols, group_cols: Sequence[str] = (),
                 spec: CuckooSpec | None = None,
                 tree_fanout: int | None = 8) -> DataFrame:
    """One cuckoo filter blob per group (two-stage: partial build, merge by
    fingerprint re-insertion).  Unlike Bloom, the result supports deletion
    (:func:`cuckoo_delete_bytes`).

    Cuckoo merge is O(stored fingerprints) per partial — NOT a cheap
    bitwise OR — so with P input partitions a flat fold does P full
    re-insertions in one task.  The default ``tree_fanout=8`` inserts a
    salted pre-merge tree (treeAggregate shape), with enough rounds that
    no task ever folds more than ~``tree_fanout`` blobs even at 10^5
    input partitions (measured: flat fold at 32 partials was SLOWER than
    a 2-partition run; the tree restores the scaling).  Pass ``None`` for
    the flat fold on small partition counts."""
    spec = spec or CuckooSpec()
    if not tree_fanout:
        return sketch_agg(df, element_cols, group_cols, spec)
    from .aggregate import build_partials
    from .skew import tree_merge_capped

    p = df.rdd.getNumPartitions()
    partials = build_partials(df, element_cols, list(group_cols), spec,
                              "sketch")
    return tree_merge_capped(partials, list(group_cols), spec, "sketch",
                             fanout=tree_fanout, n_partials=p)


def cuckoo_build_bytes(df: DataFrame, element_cols,
                       spec: CuckooSpec | None = None,
                       tree_fanout: int | None = 8) -> bytes:
    """Global deletable filter as raw bytes (driver-side)."""
    [row] = cuckoo_build(df, element_cols, (), spec,
                         tree_fanout=tree_fanout).collect()
    return bytes(row["sketch"])


# cuckoo_delete_bytes materializes the withdrawal set on the driver; cap it.
# 4M distinct keys x ~8-64 B/key is tens-of-MB driver memory — generous for
# the intended shape (recrawled urls, a revoked source) while refusing a
# corpus-sized retraction before it OOMs the driver.
MAX_DELETE_KEYS = 4_000_000


def cuckoo_delete_bytes(blob: bytes, df: DataFrame, cols,
                        spec: CuckooSpec | None = None,
                        max_keys: int = MAX_DELETE_KEYS) -> bytes:
    """Retract a (bounded) key set from a cuckoo filter blob; returns the
    updated blob.

    Deletion is inherently sequential against one filter state, so the
    retract keys are collected to the driver — the intended shape is a
    SMALL withdrawal set (recrawled urls, a revoked source) against a
    large seen-filter; the distinct key set is size-guarded at
    ``max_keys`` *executor-side* (collected through a LIMIT, the DSIR
    guard pattern) so an accidentally corpus-sized ``df`` raises instead
    of silently materializing on the driver.  Retract only keys that
    were actually inserted (Fan et al. §3.2): a never-inserted key
    usually deletes nothing, but with probability ~fpr its fingerprint
    collides with a stored element's and removes THAT element's copy —
    a silent false negative.  For corpus-sized retractions rebuild the
    filter instead — that is a full scan either way."""
    spec = spec or CuckooSpec()
    if isinstance(cols, str):
        cols = [cols]
    cols = list(cols)
    # NULL key rows are dropped BEFORE toPandas, for two reasons: a null
    # key was never inserted (build drops nulls), so retracting it is at
    # best a no-op and at ~fpr evicts an unrelated live entry; and one
    # null surviving to pandas degrades an int64 key column to float64,
    # making EVERY key in the frame hash differently from the build-side
    # encoding — the whole delete would silently no-op.
    # LIMIT caps each partition executor-side, so the driver never holds
    # more than max_keys+1 rows even when the guard is about to fire
    pdf = (df.select(*cols).na.drop().distinct()
           .limit(max_keys + 1).toPandas())
    if len(pdf) > max_keys:
        raise ValueError(
            f"withdrawal set exceeds max_keys={max_keys} distinct keys — "
            "driver-side deletion is for small retractions; rebuild the "
            "filter for corpus-sized withdrawals (a full scan either way)")
    cf = spec.from_bytes(blob)
    if len(pdf):
        cf.delete_hashes(hash_columns(pdf, cols, spec.hash_name))
    return cf.to_bytes()


def might_contain_udf(blob: bytes, cols: Sequence[str] | str,
                      spec: BloomSpec | None = None) -> Column:
    """Boolean column: True = possibly in the filter, False = definitely not.
    Rows with a NULL in any key column are definitely not members (the
    build side drops nulls) and return False.

    The blob ships via ``sc.broadcast`` (one torrent-distributed copy per
    executor) instead of the UDF closure — a right-sized 100 TB filter is
    GBs, and closures re-serialize per task.

    Dtype caveat for this raw-column form: Arrow→pandas conversion of a
    null-BEARING integer batch degrades the WHOLE batch to float64, and
    the hash encoding follows the pandas dtype — so every non-null
    integer key sharing a batch with a null mis-hashes (IEEE-bits
    encoding vs the build side's integer-bytes encoding) and probes as a
    false negative, small values included.  The in-UDF guard below masks
    the null ROWS correctly but cannot restore the batch's dtype (a
    float64 batch is indistinguishable from a genuine double column
    here).  The frame-level :func:`filter_might_contain` /
    :func:`probe_might_contain` coalesce nulls JVM-side (where column
    types are known), so no null ever reaches pandas and every dtype
    stays exact — ALWAYS prefer them for possibly-null integer keys;
    this raw form is only null-safe for string/binary/float keys."""
    if isinstance(cols, str):
        cols = [cols]
    return _might_contain_expr(blob, list(cols), spec or BloomSpec(),
                               [F.col(c) for c in cols],
                               valid=None)


def _might_contain_expr(blob: bytes, cols: list, spec, col_exprs: list,
                        valid: Column | None,
                        opaque: bool = False) -> Column:
    """Shared core: ``valid`` non-None means the caller guarantees
    ``col_exprs`` are null-free (JVM-side coalesce) and supplies the
    membership verdict for the masked rows (False).

    ``opaque=True`` marks the probe UDF non-deterministic, which pins it
    where the caller placed it: Catalyst's filter inference otherwise
    COPIES a deterministic probe across an equi-join onto the other side
    (semantically safe — no false negatives — but a wasted full Python
    pass over that side; :func:`sketchlib.spark.joinprune.pruned_join`
    probes exactly one side by design)."""
    from pyspark.sql import SparkSession

    session = SparkSession.getActiveSession()
    if session is not None:
        blob_ref = broadcast_blob(session.sparkContext, blob)

        def load():  # captures only the broadcast handle, not the blob
            return blob_ref.value
    else:
        def load():
            return blob

    # content-derived worker-cache key: repeated probe calls over the same
    # (blob, spec) share ONE per-worker deserialization — a per-call UUID
    # token would re-parse the (GBs at 100 TB) blob once per call and
    # thrash the capped worker LRU when several probe UDFs are live
    token = blob_token(blob_digest(blob), spec)
    guard_nulls = valid is None

    @F.pandas_udf(T.BooleanType())
    def _contains(*series: pd.Series) -> pd.Series:
        bf = get_or_load(token, lambda: spec.from_bytes(load()))
        pdf = pd.concat(series, axis=1)
        pdf.columns = cols
        if guard_nulls:
            ok = pdf.notna().all(axis=1).to_numpy()
            if not ok.all():
                import numpy as np
                out = np.zeros(len(pdf), dtype=bool)
                sub = pdf.loc[ok]
                if len(sub):
                    out[ok] = bf.contains_hashes(
                        hash_columns(sub, cols, spec.hash_name))
                return pd.Series(out)
        return pd.Series(bf.contains_hashes(
            hash_columns(pdf, cols, spec.hash_name)))

    if opaque:
        _contains = _contains.asNondeterministic()
    probe = _contains(*col_exprs)
    return probe if valid is None else (valid & probe)


def probe_might_contain(df: DataFrame, cols, blob: bytes,
                        spec: BloomSpec | None = None,
                        opaque: bool = False) -> Column:
    """Null-exact membership column for ``df``'s key columns: nulls are
    coalesced JVM-side to a typed filler (so integer batches never degrade
    to float64 in pandas — exact for full-range int64) and masked to
    False (a null key was never inserted)."""
    if isinstance(cols, str):
        cols = [cols]
    cols = list(cols)
    valid = F.lit(True)
    safe = []
    for c in cols:
        valid = valid & F.col(c).isNotNull()
        safe.append(F.coalesce(F.col(c), zero_lit(col_type(df, c))))
    return _might_contain_expr(blob, cols, spec or BloomSpec(), safe, valid,
                               opaque=opaque)


def filter_might_contain(df: DataFrame, cols, blob: bytes,
                         spec: BloomSpec | None = None,
                         negate: bool = False,
                         opaque: bool = False) -> DataFrame:
    """Keep rows possibly present in (or, with ``negate``, definitely absent
    from) the filter — the semi-/anti-join pre-filter.  Null-key rows are
    definitely absent (kept only under ``negate``); null handling is exact
    for every key type via :func:`probe_might_contain`."""
    c = probe_might_contain(df, cols, blob, spec, opaque=opaque)
    return df.filter(~c if negate else c)
