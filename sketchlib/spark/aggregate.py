"""Two-stage distributed sketch aggregation.

Spark has no Python UDAF with a partial/final split, so we build the classic
two-phase aggregation explicitly (SURVEY.md §4):

* **stage 1 — partial build** (``mapInArrow``): each input partition streams
  through a Python worker as Arrow record batches; element bytes hash
  straight from Arrow buffers (no pandas string materialization), group keys
  factorize via Arrow dictionary encoding, and per (group, partition) one
  partial sketch is emitted — ``(group_cols..., sketch: binary)``.
  This caps shuffle volume at ``#partitions x #groups x sketch_size`` no
  matter how many raw rows went in, and removes data skew from the shuffle:
  a hot group contributes at most one partial per partition.
* **stage 2 — final merge**: JVM-side ``groupBy().agg(collect_list(sketch))``
  (map-side partial aggregation + one exchange of blobs) followed by ONE
  vectorized pandas UDF that fold-merges each group's blobs (register-wise
  max — associative & commutative, so any merge order yields bit-identical
  canonical bytes; a lone partial passes through untouched).

This is the DataFrame-native equivalent of the reference's build-then-Merge
pipeline (``CardinalityEstimator.cs:704-730``, ``CardinalityEstimatorExtensions.cs:87-103``)
and of RDD ``treeAggregate`` — Spark's shuffle IS the parallel merge.

The reference's ``ParallelAdd`` partition strategies (``CardinalityEstimatorExtensions.cs:224-322``)
map to explicit repartitioning: Hash -> ``repartition(n, col)``,
RoundRobin -> ``repartition(n)``, Chunked -> ``coalesce(n)``; see
:mod:`sketchlib.spark.skew` for the salting used on Zipf-skewed inputs.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..encoding import encode_binary_series, encode_numeric_batch, encode_string_series
from ..hashing import HASHES
from ..hll import HllSketch


def hash_series(series: pd.Series, hash_name: str = "murmur3") -> np.ndarray:
    """Vectorized 64-bit hash of a pandas Series using the normative element
    encodings (sketchlib.encoding).  Integer width follows the Spark column
    type (int32 -> 4-byte LE, int64 -> 8-byte LE), matching the reference's
    distinct Add(int)/Add(long) encodings."""
    _scalar, flat_fn = HASHES[hash_name]
    dt = series.dtype
    if pd.api.types.is_integer_dtype(dt):
        kind = "int32" if dt.itemsize == 4 else "int64"
        flat, offsets = encode_numeric_batch(series.to_numpy(), kind)
    elif pd.api.types.is_float_dtype(dt):
        kind = "float32" if dt.itemsize == 4 else "float64"
        flat, offsets = encode_numeric_batch(series.to_numpy(), kind)
    elif pd.api.types.is_datetime64_any_dtype(dt):
        flat, offsets = encode_numeric_batch(series.to_numpy("datetime64[us]").view(np.int64), "int64")
    else:
        first = series.iloc[0] if len(series) else ""
        if isinstance(first, (bytes, bytearray)):
            flat, offsets = encode_binary_series(series)
        else:
            flat, offsets = encode_string_series(series)
    return flat_fn(flat, offsets)


def hash_arrow_columns(batch, cols: Sequence[str], hash_name: str = "murmur3") -> np.ndarray:
    """Composite element hash straight from Arrow buffers (mapInArrow hot
    path — no pandas, no per-row Python string materialization). Same
    composition rule as :func:`hash_columns`."""
    from ..encoding import arrow_flat_bytes

    _scalar, flat_fn = HASHES[hash_name]
    per = []
    for c in cols:
        flat, offsets = arrow_flat_bytes(batch.column(c))
        per.append(flat_fn(flat, offsets))
    if len(per) == 1:
        return per[0]
    combo = np.empty((per[0].shape[0], len(per)), dtype="<u8")
    for j, h in enumerate(per):
        combo[:, j] = h
    flat = combo.reshape(-1).view(np.uint8)
    offsets = np.arange(per[0].shape[0] + 1, dtype=np.int64) * (8 * len(per))
    return flat_fn(flat, offsets)


def arrow_group_codes(batch, group_cols: Sequence[str]) -> tuple[np.ndarray, tuple]:
    """Per-row group codes + unique-key *column arrays* from Arrow dictionary
    encoding — vectorized factorize, zero per-key Python.

    NULL group keys get a dedicated dictionary slot (mirroring the pandas
    path's ``factorize(use_na_sentinel=False)``): ``dictionary_encode`` emits
    null *indices* for null values, which would otherwise cast to INT64_MIN
    and silently fold the NULL group into an arbitrary real group."""
    import pyarrow as pa
    import pyarrow.compute as pc

    idx_arrays = []
    dicts = []
    for c in group_cols:
        enc = pc.dictionary_encode(batch.column(c))
        idx, d = enc.indices, enc.dictionary
        if idx.null_count:
            idx = pc.fill_null(idx, len(d))
            d = pa.concat_arrays([d, pa.nulls(1, type=d.type)])
        idx_arrays.append(idx.to_numpy(zero_copy_only=False).astype(np.int64))
        dicts.append(d)
    codes = idx_arrays[0].copy()
    sizes = [len(d) for d in dicts]
    for idx, k in zip(idx_arrays[1:], sizes[1:]):
        codes *= k
        codes += idx
    uniq = np.unique(codes)
    remap = np.searchsorted(uniq, codes)
    # decode each unique combined code back into per-column values (take on
    # the dictionary arrays — vectorized)
    key_cols = []
    rem = uniq
    for d, k in zip(reversed(dicts), reversed(sizes)):
        key_cols.append(np.asarray(d.take(rem % k).to_pandas()))
        rem = rem // k
    return remap, tuple(reversed(key_cols))


def _keys_as_tuples(key_cols: tuple) -> list[tuple]:
    return list(zip(*[c.tolist() for c in key_cols]))


def hash_columns(pdf: pd.DataFrame, cols: Sequence[str], hash_name: str = "murmur3") -> np.ndarray:
    """Composite element hash.  Single column: the element hash itself
    (reference-compatible).  Multi-column: hash of the concatenated per-column
    hashes (16/24/... fixed-width bytes) — unambiguous, vectorized, and
    library-normative (the reference is single-element only)."""
    per = [hash_series(pdf[c], hash_name) for c in cols]
    if len(per) == 1:
        return per[0]
    _scalar, flat_fn = HASHES[hash_name]
    combo = np.empty((per[0].shape[0], len(per)), dtype="<u8")
    for j, h in enumerate(per):
        combo[:, j] = h
    flat = combo.reshape(-1).view(np.uint8)
    offsets = np.arange(per[0].shape[0] + 1, dtype=np.int64) * (8 * len(per))
    return flat_fn(flat, offsets)


class SpecRepr:
    """Stable parameter-based repr shared by every sketch spec: two specs
    constructed with equal parameters repr identically (the default
    object repr embeds the instance address — under which
    ``blobcache.blob_token`` would mint a fresh worker-cache token per
    spec INSTANCE, defeating cross-call deserialization reuse for the
    common ``spec or BloomSpec()`` pattern)."""

    def __repr__(self) -> str:
        args = ", ".join(f"{k}={v!r}" for k, v in sorted(vars(self).items()))
        return f"{type(self).__name__}({args})"


class HllSpec(SpecRepr):
    """Sketch-spec protocol binding :class:`HllSketch` into the two-stage
    aggregation.  Sibling sketches (bloom/cms/kll/tdigest) implement the same
    four methods plus ``estimate_fields``."""

    name = "hll"
    #: distinct-counting sketches are a pure function of the *set* of element
    #: hashes -> stage 1 may dedup (group, hash) pairs and batch-build
    #: (the vectorized many-tiny-groups fast path).
    hash_dedup = True

    def __init__(self, p: int = 14, hash_name: str = "murmur3",
                 use_direct_counting: bool = True,
                 prehashed: bool = False) -> None:
        self.p = p
        self.hash_name = hash_name
        self.use_direct_counting = use_direct_counting
        #: the element column already IS the 64-bit element hash (computed
        #: JVM-side, e.g. ``F.xxhash64``); ``prepare`` reinterprets the int64
        #: values instead of encoding+hashing in Python.  See
        #: :func:`build_partials` ``prehash64``.
        self.prehashed = prehashed

    def make(self):
        return HllSketch(p=self.p, use_direct_counting=self.use_direct_counting)

    def build_from_hashes(self, unique_hashes: np.ndarray, count_additions: int):
        return HllSketch.from_unique_hashes(
            unique_hashes, p=self.p, count_additions=count_additions,
            use_direct_counting=self.use_direct_counting)

    def blob_from_hashes(self, sorted_unique_hashes: np.ndarray,
                         count_additions: int) -> bytes:
        """Serialized sketch straight from a group's sorted unique hashes;
        direct-mode groups skip sketch-object construction entirely."""
        from ..hll import DIRECT_COUNTER_MAX_ELEMENTS, direct_blob

        n = sorted_unique_hashes.shape[0]
        sparse_max = max(0, (1 << self.p) // 15 - 10)
        if (self.use_direct_counting and n <= DIRECT_COUNTER_MAX_ELEMENTS
                and n <= sparse_max):
            return direct_blob(self.p, sorted_unique_hashes, count_additions)
        return self.to_bytes(self.build_from_hashes(sorted_unique_hashes,
                                                    count_additions))

    def prepare(self, pdf: pd.DataFrame, element_cols: Sequence[str]) -> np.ndarray:
        if self.prehashed:
            return np.ascontiguousarray(
                pdf[element_cols[0]].to_numpy(np.int64)).view(np.uint64)
        return hash_columns(pdf, element_cols, self.hash_name)

    def prepare_arrow(self, batch, element_cols: Sequence[str]) -> np.ndarray:
        if self.prehashed:
            return np.ascontiguousarray(
                batch.column(element_cols[0]).to_numpy(zero_copy_only=False)
            ).view(np.uint64)
        return hash_arrow_columns(batch, element_cols, self.hash_name)

    def ingest(self, sketch: HllSketch, prepared: np.ndarray) -> None:
        sketch.add_hashes(prepared)

    def to_bytes(self, sketch: HllSketch) -> bytes:
        return sketch.to_bytes()

    def from_bytes(self, blob: bytes) -> HllSketch:
        return HllSketch.from_bytes(blob)

    def merge(self, a: HllSketch, b: HllSketch) -> HllSketch:
        a.merge(b)
        return a

    @staticmethod
    def fold_blobs(blobs) -> bytes:
        """Wire-level group fold (sketchlib/hll.py fold_blobs) — bit-identical
        to sequential merge, picked up by merge_blobs_udf as the fast path."""
        from ..hll import fold_blobs as _fold

        return _fold(blobs)

    estimate_type = T.LongType()

    def estimate(self, sketch: HllSketch) -> int:
        return sketch.count()


def _group_field(df: DataFrame, name: str) -> T.StructField:
    f = df.schema[name]
    return T.StructField(f.name, f.dataType, True)


class _PairAccumulator:
    """Stage-1 state for dedup-able sketches (HLL/Bloom): accumulates
    (group-code, element-hash) pairs across Arrow batches, sort-dedups on a
    size threshold, and spills any group past ``spill_threshold`` distinct
    hashes into a register sketch so memory stays bounded by
    ``#small-groups x spill_threshold x 16B + #big-groups x sketch_size``
    regardless of partition row count.

    Per-row AND per-group work is vectorized: batches arrive with batch-local
    codes plus their unique-key *column arrays*; codes globalize lazily in one
    pandas factorize over the concatenated key columns (no per-key Python),
    and per-group blob emission at partition end uses a direct-blob fast path
    for small groups. This is what makes millions of tiny groups (e.g.
    per-host distincts) cheap."""

    def __init__(self, spec, compact_threshold: int = 1 << 23,
                 spill_threshold: int = 1 << 12) -> None:
        self.spec = spec
        self.compact_threshold = compact_threshold
        self.spill_threshold = spill_threshold
        # pending batches: (key_cols tuple[np.ndarray], local codes, hashes)
        self.batches: list[tuple[tuple, np.ndarray, np.ndarray]] = []
        self.pending = 0
        # globalized state
        self.gkey_cols: tuple | None = None
        self.gcodes = np.zeros(0, dtype=np.int64)
        self.ghashes = np.zeros(0, dtype=np.uint64)
        self.gadds = np.zeros(0, dtype=np.int64)
        self.spilled: dict[int, object] = {}

    def add_batch(self, local_codes: np.ndarray, key_cols: tuple,
                  hashes: np.ndarray) -> None:
        self.batches.append((key_cols,
                             np.ascontiguousarray(local_codes, dtype=np.int64),
                             np.ascontiguousarray(hashes, dtype=np.uint64)))
        self.pending += local_codes.shape[0]
        if self.pending > self.compact_threshold:
            self._globalize()

    @staticmethod
    def _factorize_cols(cols: tuple) -> tuple[np.ndarray, tuple]:
        if len(cols) == 1:
            codes, uniq = pd.factorize(cols[0], use_na_sentinel=False)
            return codes.astype(np.int64), (np.asarray(uniq),)
        mi = pd.MultiIndex.from_arrays(list(cols))
        codes, uniq = mi.factorize(use_na_sentinel=False)
        return codes.astype(np.int64), tuple(
            np.asarray(uniq.get_level_values(i)) for i in range(len(cols)))

    def _globalize(self) -> None:
        """One vectorized pass: re-factorize all known keys (existing globals
        + every pending batch's uniques), remap codes through per-source LUTs,
        accumulate additions, sort-dedup pairs, spill huge groups."""
        if not self.batches and self.gkey_cols is not None:
            return
        parts = []
        if self.gkey_cols is not None:
            parts.append(self.gkey_cols)
        for key_cols, _codes, _hashes in self.batches:
            parts.append(key_cols)
        if not parts:
            return
        ncols = len(parts[0])
        cat = tuple(np.concatenate([p[i] for p in parts]) for i in range(ncols))
        all_codes, uniq_cols = self._factorize_cols(cat)
        n_uniq = uniq_cols[0].shape[0]

        # split the lut back per source
        offs = np.cumsum([0] + [p[0].shape[0] for p in parts])
        luts = [all_codes[offs[i]:offs[i + 1]] for i in range(len(parts))]

        new_adds = np.zeros(n_uniq, dtype=np.int64)
        codes_list = []
        hashes_list = []
        li = 0
        if self.gkey_cols is not None:
            lut = luts[0]
            li = 1
            codes_list.append(lut[self.gcodes])
            hashes_list.append(self.ghashes)
            np.add.at(new_adds, lut, self.gadds)
            if self.spilled:
                self.spilled = {int(lut[c]): sk for c, sk in self.spilled.items()}
        for (key_cols, codes, hashes), lut in zip(self.batches, luts[li:]):
            codes_list.append(lut[codes])
            hashes_list.append(hashes)
            np.add.at(new_adds, lut,
                      np.bincount(codes, minlength=key_cols[0].shape[0]))
        self.batches = []
        self.pending = 0
        self.gkey_cols = uniq_cols
        self.gadds = new_adds

        codes = np.concatenate(codes_list)
        hashes = np.concatenate(hashes_list)
        order = np.lexsort((hashes, codes))
        codes = codes[order]
        hashes = hashes[order]
        keep = np.ones(codes.shape[0], dtype=bool)
        keep[1:] = (codes[1:] != codes[:-1]) | (hashes[1:] != hashes[:-1])
        codes = codes[keep]
        hashes = hashes[keep]
        # spill groups with > spill_threshold distinct hashes to sketches
        counts = np.bincount(codes, minlength=n_uniq)
        big = np.nonzero(counts > self.spill_threshold)[0]
        if big.shape[0]:
            starts = np.searchsorted(codes, big, side="left")
            ends = np.searchsorted(codes, big, side="right")
            drop = np.zeros(codes.shape[0], dtype=bool)
            for c, s, e in zip(big.tolist(), starts.tolist(), ends.tolist()):
                sk = self.spilled.get(int(c))
                if sk is None:
                    sk = self.spec.make()
                    self.spilled[int(c)] = sk
                self.spec.ingest(sk, hashes[s:e])
                drop[s:e] = True
            codes = codes[~drop]
            hashes = hashes[~drop]
        self.gcodes = codes
        self.ghashes = hashes

    def finalize(self, group_cols: Sequence[str], sketch_col: str):
        self._globalize()
        if self.gkey_cols is None:
            return
        codes = self.gcodes
        hashes = self.ghashes
        n = self.gkey_cols[0].shape[0]
        starts = np.searchsorted(codes, np.arange(n), side="left")
        ends = np.searchsorted(codes, np.arange(n), side="right")
        fast_blob = getattr(self.spec, "blob_from_hashes", None)
        blobs = []
        adds = self.gadds
        for c in range(n):
            seg = hashes[starts[c]:ends[c]]
            sk = self.spilled.get(c)
            if sk is None:
                if fast_blob is not None:
                    blobs.append(fast_blob(seg, int(adds[c])))
                    continue
                sk = self.spec.build_from_hashes(seg, int(adds[c]))
            else:
                if seg.shape[0]:
                    self.spec.ingest(sk, seg)
                sk.count_additions = int(adds[c])
            blobs.append(self.spec.to_bytes(sk))
        if group_cols:
            out = pd.DataFrame({g: col for g, col in zip(group_cols, self.gkey_cols)})
        else:
            out = pd.DataFrame(index=range(len(blobs)))
        out[sketch_col] = blobs
        yield out


def build_partials(df: DataFrame, element_cols: Sequence[str] | str,
                   group_cols: Sequence[str] = (), spec: HllSpec | None = None,
                   sketch_col: str = "sketch") -> DataFrame:
    """Stage 1: one partial sketch per (group, input partition).

    Only ``group_cols + element_cols`` are selected, so Catalyst prunes every
    other column at the scan (never deserializes e.g. an ``html`` payload)."""
    if isinstance(element_cols, str):
        element_cols = [element_cols]
    element_cols = list(element_cols)
    group_cols = list(group_cols)
    spec = spec or HllSpec()

    if getattr(spec, "prehashed", False):
        # JVM-side prehash fast path: the element hash is computed inside
        # whole-stage codegen (xxhash64) and only 8 bytes/row cross the
        # Arrow boundary instead of the raw element bytes — this lifts the
        # measured JVM->Python transfer ceiling ~4x on url-shaped data
        # (BENCH/BASELINE.md).  Semantics: distinct over 64-bit fingerprints;
        # expected collision undercount is n/2^65 relative (2.7e-8 at n=1e12),
        # far below HLL's 1.04/sqrt(m) bound, but blobs are NOT mergeable
        # with murmur3-of-raw-element sketches over the same column.
        cond = None
        for c in element_cols:
            nn = F.col(c).isNotNull()
            cond = nn if cond is None else cond & nn
        df = (df.filter(cond)
                .select(*group_cols, F.xxhash64(*element_cols).alias("__fp64")))
        element_cols = ["__fp64"]

    out_schema = T.StructType(
        [_group_field(df, g) for g in group_cols] + [T.StructField(sketch_col, T.BinaryType(), False)]
    )

    def _arrow_out_schema():
        """Arrow schema matching ``out_schema`` — the yielded batches are
        built from pandas frames, where a NULL key in an int64/date group
        column surfaces as NaN in a float64 array; from_pandas with an
        explicit schema converts that back to a typed null."""
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(out_schema)

    def build_arrow(batches):
        """Arrow-native build (mapInArrow): element bytes are hashed straight
        from Arrow buffers; group keys factorize via dictionary encoding.
        Strings never materialize as Python objects — this path is ~3x the
        row throughput of the pandas path on url-shaped data."""
        import pyarrow as pa

        pa_schema = _arrow_out_schema()
        acc = _PairAccumulator(spec)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            mask = None
            for c in element_cols:
                col = batch.column(c)
                if col.null_count:
                    import pyarrow.compute as pc
                    v = pc.is_valid(col)
                    mask = v if mask is None else pc.and_(mask, v)
            if mask is not None:
                batch = batch.filter(mask)
                if batch.num_rows == 0:
                    continue
            prepared = spec.prepare_arrow(batch, element_cols)
            if group_cols:
                local_codes, key_cols = arrow_group_codes(batch, group_cols)
            else:
                local_codes = np.zeros(batch.num_rows, dtype=np.int64)
                key_cols = (np.zeros(1, dtype=np.int64),)
            acc.add_batch(local_codes, key_cols, prepared)
        for pdf in acc.finalize(group_cols, sketch_col):
            yield pa.RecordBatch.from_pandas(pdf, schema=pa_schema,
                                             preserve_index=False)

    def build_dedup(batches: Iterable[pd.DataFrame]):
        """Dedup-able sketches (HLL/Bloom): vectorized pair accumulation;
        per-group Python cost is one sketch materialization per group per
        partition, at partition end."""
        acc = _PairAccumulator(spec)
        for pdf in batches:
            pdf = pdf.dropna(subset=element_cols)
            if pdf.empty:
                continue
            prepared = spec.prepare(pdf, element_cols)
            if group_cols:
                if len(group_cols) == 1:
                    local_codes, uniques = pd.factorize(
                        pdf[group_cols[0]], use_na_sentinel=False)
                    key_cols = (np.asarray(uniques),)
                else:
                    mi = pd.MultiIndex.from_frame(pdf[group_cols])
                    local_codes, uniques = mi.factorize(use_na_sentinel=False)
                    key_cols = tuple(np.asarray(uniques.get_level_values(i))
                                     for i in range(len(group_cols)))
            else:
                local_codes = np.zeros(len(pdf), dtype=np.int64)
                key_cols = (np.zeros(1, dtype=np.int64),)
            acc.add_batch(np.asarray(local_codes, dtype=np.int64), key_cols, prepared)
        yield from acc.finalize(group_cols, sketch_col)

    def build_stream_arrow(batches):
        """Arrow-native streaming build for non-dedup sketches (CMS,
        t-digest, KLL): one live sketch per group; per batch the rows are
        ordered by group code once and each group's slice is ingested
        vectorized."""
        import pyarrow as pa

        pa_schema = _arrow_out_schema()
        sketches: dict[tuple, object] = {}
        for batch in batches:
            if batch.num_rows == 0:
                continue
            mask = None
            for c in element_cols:
                col = batch.column(c)
                if col.null_count:
                    import pyarrow.compute as pc
                    v = pc.is_valid(col)
                    mask = v if mask is None else pc.and_(mask, v)
            if mask is not None:
                batch = batch.filter(mask)
                if batch.num_rows == 0:
                    continue
            prepared = spec.prepare_arrow(batch, element_cols)
            if group_cols:
                codes, key_cols = arrow_group_codes(batch, group_cols)
                keys = _keys_as_tuples(key_cols)
            else:
                codes = np.zeros(batch.num_rows, dtype=np.int64)
                keys = [()]
            order = np.argsort(codes, kind="stable")
            sorted_codes = codes[order]
            starts = np.searchsorted(sorted_codes, np.arange(len(keys)), side="left")
            ends = np.searchsorted(sorted_codes, np.arange(len(keys)), side="right")
            for k, s, e in zip(keys, starts.tolist(), ends.tolist()):
                if s == e:
                    continue
                sk = sketches.get(k)
                if sk is None:
                    sk = spec.make()
                    sketches[k] = sk
                spec.ingest(sk, prepared[order[s:e]])
        if sketches:
            rows = [list(k) + [spec.to_bytes(s)] for k, s in sketches.items()]
            pdf = pd.DataFrame(rows, columns=group_cols + [sketch_col])
            yield pa.RecordBatch.from_pandas(pdf, schema=pa_schema,
                                             preserve_index=False)

    def build_stream(batches: Iterable[pd.DataFrame]):
        """Generic streaming path: one live sketch per group, batch-ingested."""
        sketches: dict[tuple, object] = {}
        for pdf in batches:
            pdf = pdf.dropna(subset=element_cols)
            if pdf.empty:
                continue
            prepared = spec.prepare(pdf, element_cols)
            if group_cols:
                indices = pdf.groupby(group_cols, sort=False, dropna=False).indices
                for key, idx in indices.items():
                    k = key if isinstance(key, tuple) else (key,)
                    sk = sketches.get(k)
                    if sk is None:
                        sk = spec.make()
                        sketches[k] = sk
                    spec.ingest(sk, prepared[idx])
            else:
                sk = sketches.get(())
                if sk is None:
                    sk = spec.make()
                    sketches[()] = sk
                spec.ingest(sk, prepared)
        if sketches:
            rows = [list(k) + [spec.to_bytes(s)] for k, s in sketches.items()]
            yield pd.DataFrame(rows, columns=group_cols + [sketch_col])

    needed = list(dict.fromkeys(group_cols + element_cols))  # dedupe overlap
    pruned = df.select(*needed)
    has_arrow = hasattr(spec, "prepare_arrow")
    if getattr(spec, "hash_dedup", False):
        if has_arrow:
            return pruned.mapInArrow(build_arrow, out_schema)
        return pruned.mapInPandas(build_dedup, out_schema)
    if has_arrow:
        return pruned.mapInArrow(build_stream_arrow, out_schema)
    return pruned.mapInPandas(build_stream, out_schema)


def merge_blobs_udf(spec) -> Column:
    """Vectorized fold-merge of an ``array<binary>`` column of serialized
    partial sketches into one blob per row.  Used after a JVM-side
    ``groupBy().agg(collect_list(sketch))`` — the whole merge stage stays in
    Spark's hash aggregate (map-side partial collect + shuffle), and Python is
    entered exactly once per output group with an Arrow batch of groups, not
    once per group (the ``applyInPandas`` per-group overhead this replaces)."""

    # wire-level fold fast path (sketchlib/hll.py fold_blobs): bit-identical
    # to the object loop, ~an order of magnitude less per-blob constant —
    # the difference between 13M-blob HyperBall rounds being merge-bound or
    # not.  Specs without a fold keep the generic object path.
    fold = getattr(spec, "fold_blobs", None)

    @F.pandas_udf(T.BinaryType())
    def _merge(lists: pd.Series) -> pd.Series:
        out = []
        for blobs in lists:
            if len(blobs) == 1:
                # canonical serialization -> a lone partial IS the result
                # (the common case when input is clustered by the group key)
                out.append(bytes(blobs[0]))
                continue
            if fold is not None and len(blobs) > 1:
                out.append(fold([bytes(b) for b in blobs]))
                continue
            merged = None
            for b in blobs:
                sk = spec.from_bytes(bytes(b))
                merged = sk if merged is None else spec.merge(merged, sk)
            # empty group (global agg over zero rows): emit the empty sketch,
            # so COUNT(DISTINCT <empty>) estimates 0 like SQL
            out.append(spec.to_bytes(merged if merged is not None else spec.make()))
        return pd.Series(out)

    return _merge


def merge_estimate_udf(spec) -> Column:
    """Fused fold-merge + estimate over an ``array<binary>`` column: one
    Python entry per output group yielding the scalar estimate directly.

    Functionally identical to ``merge_blobs_udf`` followed by
    ``estimate_col`` (canonical serialization round-trips bit-for-bit, so
    estimating the in-memory merged sketch equals estimating its
    deserialized blob) — but the merged blob never crosses back to the JVM
    only to be shipped to Python a second time for estimation: for a
    per-group query that only wants the NUMBER, this removes one full
    JVM->Python->JVM round trip of every group's blob plus a serialize +
    deserialize per group."""
    fold = getattr(spec, "fold_blobs", None)

    @F.pandas_udf(spec.estimate_type)
    def _merge_estimate(lists: pd.Series) -> pd.Series:
        out = []
        for blobs in lists:
            if len(blobs) == 0:
                # empty group (global agg over zero rows): estimate 0
                out.append(spec.estimate(spec.make()))
                continue
            if len(blobs) == 1:
                out.append(spec.estimate(spec.from_bytes(bytes(blobs[0]))))
                continue
            if fold is not None:
                out.append(spec.estimate(
                    spec.from_bytes(fold([bytes(b) for b in blobs]))))
                continue
            merged = None
            for b in blobs:
                sk = spec.from_bytes(bytes(b))
                merged = sk if merged is None else spec.merge(merged, sk)
            out.append(spec.estimate(merged))
        return pd.Series(out)

    return _merge_estimate


def merge_partials(partials: DataFrame, group_cols: Sequence[str] = (),
                   spec: HllSpec | None = None, sketch_col: str = "sketch") -> DataFrame:
    """Stage 2: fold-merge each group's partial sketches into one.

    Register-wise max is associative & commutative, so any merge order yields
    bit-identical canonical bytes (CardinalityEstimator.cs:615-685)."""
    group_cols = list(group_cols)
    spec = spec or HllSpec()
    merge = merge_blobs_udf(spec)
    collected = F.collect_list(sketch_col).alias("__blobs")
    if group_cols:
        agged = partials.groupBy(*group_cols).agg(collected)
    else:
        agged = partials.agg(collected)
    return agged.select(*group_cols, merge("__blobs").alias(sketch_col))


def rollup_sketches(sketch_df: DataFrame, to_group_cols: Sequence[str],
                    spec: HllSpec | None = None,
                    sketch_col: str = "sketch") -> DataFrame:
    """Re-aggregate already-built sketches to a coarser grouping WITHOUT
    touching the raw input — the pre-aggregated rollup pattern.

    Because merge is associative and commutative with canonical
    serialization (reference ``CardinalityEstimator.cs:615-685``; pinned
    bit-for-bit in tests), a materialized per-(lang, day) sketch table rolls
    up to per-lang / per-day / all-time in one tiny shuffle of blobs: at
    10^12 rows the daily build scans the data once, and every coarser
    report is derived from kilobytes of sketches — never a rescan.  The
    rolled-up sketch is bit-identical to one built directly from the raw
    rows, so estimates and error bounds carry over unchanged."""
    return merge_partials(sketch_df, list(to_group_cols), spec, sketch_col)


def rolling_merge(sketch_df: DataFrame, order_col: str, window: int,
                  spec: HllSpec | None = None,
                  group_cols: Sequence[str] = (),
                  sketch_col: str = "sketch") -> DataFrame:
    """Rolling union over the trailing ``window`` units of an integer-ordered
    sketch table: output row (groups..., o) carries the merge of sketches
    for order values in ``(o - window, o]`` — e.g. 7-day rolling distinct
    users from a *daily* sketch table, no raw-input rescan.

    Union-only sketches (HLL/Theta/Bloom/CMS) can't subtract, so the
    classic streaming trick (add new day, remove old) is unavailable;
    instead each daily sketch is *contributed* to the ≤``window`` rolling
    rows it participates in (a JVM ``sequence``+``explode`` of blob rows —
    ``window × groups × units`` blobs, kilobytes each) and each rolling row
    fold-merges its contributions.  One shuffle of blobs, same as any
    rollup; associativity makes the result bit-identical to building each
    window from raw rows.  Output rows are kept only for order values that
    actually exist in the input (trailing windows anchored at absent units
    would double-report).

    ``order_col`` must be integer-like (for dates, pass e.g.
    ``F.datediff(day, lit(epoch))`` first)."""
    spec = spec or HllSpec()
    group_cols = list(group_cols)
    contrib = sketch_df.select(
        *group_cols,
        F.explode(F.sequence(F.col(order_col),
                             F.col(order_col) + window - 1)).alias(order_col),
        sketch_col)
    anchors = sketch_df.select(*group_cols, order_col).distinct()
    contrib = contrib.join(anchors, on=group_cols + [order_col], how="leftsemi")
    return merge_partials(contrib, group_cols + [order_col], spec, sketch_col)


def estimate_col(spec: HllSpec | None = None, sketch_col: str | Column = "sketch") -> Column:
    """Scalar estimate as a vectorized pandas UDF over sketch blobs (one blob
    per group — Python cost is per-group, not per-row)."""
    spec = spec or HllSpec()

    @F.pandas_udf(spec.estimate_type)
    def _estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else spec.estimate(spec.from_bytes(bytes(b)))
                          for b in blobs])

    return _estimate(sketch_col if isinstance(sketch_col, Column) else F.col(sketch_col))


def sketch_agg(df: DataFrame, element_cols, group_cols: Sequence[str] = (),
               spec: HllSpec | None = None, sketch_col: str = "sketch",
               tree_fanout: int | None = None) -> DataFrame:
    """Full two-stage aggregation -> one sketch blob per group.

    ``tree_fanout``: insert a salted pre-merge round (treeAggregate shape) —
    use when #input partitions is large enough that a single group's
    collect_list would gather thousands of blobs into one task (e.g. >1k
    partitions with few groups).

    NULL-semantics caveat: NULL elements carry no sketch mass (matching
    SQL's COUNT(DISTINCT)), so a group whose elements are ALL NULL
    produces NO output row — where SQL's GROUP BY would return that group
    with count 0.  The global (ungrouped) aggregate always yields exactly
    one row (estimate 0 on an empty or all-null input).  Left-join the
    group universe afterwards if zero-rows for null-only groups matter."""
    spec = spec or HllSpec()
    partials = build_partials(df, element_cols, group_cols, spec, sketch_col)
    if tree_fanout:
        from .skew import tree_merge_partials

        return tree_merge_partials(partials, group_cols, spec, sketch_col,
                                   fanout=tree_fanout, levels=1)
    return merge_partials(partials, group_cols, spec, sketch_col)


def distinct_count(df: DataFrame, element_cols, group_cols: Sequence[str] = (),
                   p: int = 14, hash_name: str = "murmur3",
                   estimate_name: str = "estimate",
                   spec: "HllSpec | None" = None,
                   spec_factory=None, tree_fanout: int | None = None,
                   prehash64: bool = False) -> DataFrame:
    """Approximate ``COUNT(DISTINCT element_cols...)`` per group via HLL (or
    any cardinality-estimating spec passed via ``spec``/``spec_factory``).

    HLL: exact (direct-count mode) for groups with <= 100 distinct elements;
    within 1.04/sqrt(2^p) relative std-error beyond (README.md:58).

    ``prehash64=True`` computes the element hash JVM-side (``F.xxhash64``)
    so only 8 bytes/row cross the Arrow boundary — the throughput path for
    wide string elements at cluster scale.  Trade-offs documented at
    :func:`build_partials`.
    """
    if spec is None:
        spec = (spec_factory() if spec_factory is not None
                else HllSpec(p=p, hash_name=hash_name, prehashed=prehash64))
    group_cols = list(group_cols)
    if tree_fanout:
        merged = sketch_agg(df, element_cols, group_cols, spec,
                            tree_fanout=tree_fanout)
        return merged.select(*group_cols,
                             estimate_col(spec).alias(estimate_name))
    # fused merge+estimate: the caller only wants the scalar, so the merged
    # blob never round-trips JVM->Python a second time (merge_estimate_udf)
    partials = build_partials(df, element_cols, group_cols, spec)
    collected = F.collect_list("sketch").alias("__blobs")
    agged = (partials.groupBy(*group_cols).agg(collected) if group_cols
             else partials.agg(collected))
    return agged.select(*group_cols,
                        merge_estimate_udf(spec)(F.col("__blobs"))
                        .alias(estimate_name))


def premerge_partials(partials: DataFrame, group_cols: Sequence[str],
                      spec=None, sketch_col: str = "sketch") -> DataFrame:
    """Map-side combine for BLOB tables: fold each input partition's blobs
    per group BEFORE any shuffle — a narrow ``mapInArrow`` pass, no
    exchange.  Output is at most (distinct groups in partition) rows per
    partition, so a downstream :func:`merge_partials` shuffles
    ``min(rows, groups x partitions)`` blobs instead of every input row.

    Spark's own map-side combine (partial ``collect_list``) gathers blobs
    but cannot MERGE them (the merge is a Python UDF); this pass does the
    merge early, which matters when many same-group blobs share a
    partition — e.g. HyperBall's relaxation join output, where a node's
    contributions from all its out-neighbors in one partition collapse to
    a single blob (hub fan-in drops from |E| shuffled rows to
    <= |V| x partitions).  Worth it whenever blobs-per-(group, partition)
    exceeds ~1: on a power-law host graph the HyperBall relaxation's
    merge-shuffle input drops 13.15M -> 132k rows (99.7x measured at 24M
    pages); on a uniform-degree synthetic it is ~1.1x and the LOCAL wall
    is a wash (isolated alternating A/B, min-of-2: 220.2 s vs 188.9 s —
    local shuffle is nearly free, so the volume cut pays on
    network-shuffle clusters, not single-box runs).  A truly all-unique
    blob table gains nothing and pays one narrow pass
    (``hyperball(premerge=False)``).

    Associativity + commutativity of the merge (canonical-bytes pinned)
    makes the final result bit-identical with or without this pass.
    Worker memory is O(blobs in the partition) — the shuffle input it
    replaces.  Group keys factorize through ``arrow_group_codes``
    (dictionary encoding), so NULL keys and full-range int64 keys
    round-trip exactly; singleton groups pass their canonical blob
    through untouched (no re-serialization).
    """
    import pyarrow as pa

    spec = spec or HllSpec()
    group_cols = list(group_cols)
    fold = getattr(spec, "fold_blobs", None)
    if fold is None:
        def fold(blobs):  # generic object-path fallback, same semantics
            merged = None
            for b in blobs:
                sk = spec.from_bytes(bytes(b))
                merged = sk if merged is None else spec.merge(merged, sk)
            return spec.to_bytes(merged)

    narrowed = partials.select(*group_cols, sketch_col)
    schema = narrowed.schema

    def combine(batches):
        from pyspark.sql.pandas.types import to_arrow_schema

        pa_schema = to_arrow_schema(schema)
        acc: dict = {}  # key tuple -> list[bytes]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            codes, key_cols = arrow_group_codes(batch, group_cols)
            keys = _keys_as_tuples(key_cols)
            blobs = batch.column(sketch_col).to_pylist()
            # C-speed zip; dict/list ops are the only per-row Python cost
            for code, blob in zip(codes.tolist(), blobs):
                k = keys[code]
                lst = acc.get(k)
                if lst is None:
                    acc[k] = [blob]
                else:
                    lst.append(blob)
        if not acc:
            return
        out_keys = list(acc.keys())
        # NULL keys in numeric columns ride through the dictionary decode as
        # NaN floats (same as the build_partials pandas emit) — from_pandas
        # with the explicit field type converts them back to typed nulls
        arrays = [
            pa.Array.from_pandas(pd.Series([k[i] for k in out_keys]),
                                 type=pa_schema.field(i).type, safe=False)
            for i in range(len(group_cols))
        ]
        arrays.append(pa.array(
            [blobs[0] if len(blobs) == 1 else fold(blobs)
             for blobs in acc.values()],
            type=pa.binary()))
        yield pa.RecordBatch.from_arrays(arrays, schema=pa_schema)

    return narrowed.mapInArrow(combine, schema)
