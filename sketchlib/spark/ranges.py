"""Sketch-driven balanced range partitioning (no sampling job).

Spark's ``repartitionByRange`` / ``orderBy`` launch a *separate sampling
job* (RangePartitioner reservoir sampling: ``sampleSizePerPartition`` rows
collected to the driver) before the real shuffle — at 100 TB that is an
extra pass over every input split just to pick boundaries.  This module
derives the boundaries from a KLL quantile sketch instead:

* ``kll_boundaries`` — one mergeable-aggregate scan builds a k=200 KLL
  (Karnin-Lang-Liberty 2016) whose ~1% normalized rank error makes every
  bucket hold ``1/B ± 2ε`` of the rows w.h.p.; the blob is <= a few KB on
  the driver regardless of input size.  When the column was already
  profiled (``spark/profile.py`` builds KLL blobs per numeric column),
  ``boundaries_from_blob`` prices the boundaries at ZERO extra scans.
* ``bucket_expr`` — an O(log B) branch-free ``WHEN`` *binary-search tree*
  over the boundary literals (searchsorted-right semantics), fully inside
  whole-stage codegen: B=1024 partitions costs 10 comparisons per row, not
  a 1024-element array walk and no Python.
* ``hash_preimage_relabel`` — ``df.repartition(B, col)`` hash-partitions,
  so bucket j would land on ``pmod(hash(j), B)`` with balls-in-bins
  collisions leaving ~1/e of partitions empty.  We instead relabel bucket
  j to an integer v_j chosen so ``pmod(hash(v_j), B) == j`` — the
  preimages are found by probing *Spark's own* ``hash()`` (one tiny
  driver-side job over a few thousand ints), so the mapping is exact by
  construction, never a reimplementation of Murmur3 that could drift.
  Result: every bucket gets exactly its own output partition.
* ``repartition_by_boundaries`` / ``balanced_sort`` — compose the above:
  a globally sorted (partition i entirely < partition i+1), balanced
  dataset in ONE shuffle with NO sampling job.

String columns (urls — the flagship key) partition through an
order-preserving prefix transform: 8 bytes big-endian as an unsigned
integer cast to double (``str_order_key``), taken AFTER skipping the
corpus-wide longest common prefix (computed from one min/max aggregate —
every string lies between min and max, so all share their LCP).  Without
the skip a url corpus is useless to prefix-bucket: every key starts
``https://``.  The transform is monotone w.r.t. Spark's binary string
comparison (rounding u64→double is monotone, zero-padding shorter strings
preserves byte order), so buckets respect string order exactly and
``sortWithinPartitions`` on the ORIGINAL string column yields a correct
global sort; strings tying on all 8 post-LCP bytes merely colocate.

Ordering conventions match Spark's sort order so ``balanced_sort`` is a
drop-in for ``orderBy``: NULLs first (bucket 0), NaN last (bucket B-1).
Ties colocate (equal values share a bucket) — a single value carrying more
than 1/B of the rows therefore caps achievable balance; diagnose that
first with ``spark/skewdiag.diagnose_skew``.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .aggregate import sketch_agg
from .specs import KllSpec

MAX_BUCKETS = 65536  # boundary literals live in the plan; keep it sane


def boundaries_from_blob(blob: bytes, num_buckets: int, spec=None) -> np.ndarray:
    """B-1 ascending boundaries from an existing quantile-sketch blob
    (KLL or t-digest spec) — zero scans.  Duplicate quantiles (a value
    holding >1/B of the mass) are kept: buckets between two equal
    boundaries are simply empty, and the bucket expression stays a
    correct searchsorted."""
    if not 2 <= num_buckets <= MAX_BUCKETS:
        raise ValueError(f"num_buckets must be in [2, {MAX_BUCKETS}]")
    spec = spec or KllSpec()
    sk = spec.from_bytes(bytes(blob))
    if sk.count_additions == 0:
        raise ValueError("quantile sketch is empty — no rows to partition")
    probs = np.arange(1, num_buckets) / num_buckets
    return np.asarray(sk.quantile(probs), dtype=np.float64)


def str_order_key(value_col: str | Column, skip: int = 0) -> Column:
    """Order-preserving double from a string: bytes [skip, skip+8) big-
    endian as an unsigned integer.  For strings agreeing on their first
    ``skip`` bytes, a < b (Spark binary compare) => key(a) <= key(b), with
    equality only when the 8 post-skip bytes tie — so range buckets built
    on the key respect full string order, and prefix-tied strings
    colocate."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    raw = F.substring(col.cast("binary"), int(skip) + 1, 8)
    return F.conv(F.rpad(F.hex(raw), 16, "0"), 16, 10).cast("double")


def str_common_prefix_len(df: DataFrame, value_col: str) -> int:
    """Byte length of the corpus-wide longest common prefix — one min/max
    codegen aggregate (every string lies between min and max, so the
    corpus LCP equals LCP(min, max))."""
    [r] = df.select(F.min(value_col).alias("lo"),
                    F.max(value_col).alias("hi")).collect()
    if r["lo"] is None:
        return 0
    a, b = r["lo"].encode("utf-8"), r["hi"].encode("utf-8")
    return len(os.path.commonprefix([a, b]))


def _is_string(df: DataFrame, value_col: str) -> bool:
    return df.schema[value_col].dataType.typeName() == "string"


def kll_boundaries(df: DataFrame, value_col: str, num_buckets: int,
                   spec=None, str_skip: int | None = None,
                   sample_fraction: float | None = None) -> np.ndarray:
    """One sketch-aggregate scan -> B-1 boundaries on the driver.  For a
    string column the boundaries live in ``str_order_key`` space with the
    LCP skipped (auto-computed unless ``str_skip`` is given — pass the
    same value to ``repartition_by_boundaries``).

    ``sample_fraction``: build the sketch over a Bernoulli sample instead
    of every row.  The sample filter runs JVM-side, so only f·n rows cross
    to the Python sketch stage — this is what makes the boundary scan
    cheaper than Spark's own RangePartitioner sampling pass (measured in
    BENCH/BASELINE.md).  Sampling adds ~sqrt(ln(2/δ)/(2·f·n)) rank error
    (DKW) on top of the sketch's own — at f·n = 500k that is ±0.2%,
    irrelevant for partition balance.  Deterministic seed: reruns pick
    identical boundaries."""
    spec = spec or KllSpec()
    if _is_string(df, value_col):
        skip = (str_common_prefix_len(df, value_col) if str_skip is None
                else int(str_skip))
        elem, key = str_order_key(value_col, skip).alias("__ok"), "__ok"
    else:
        elem, key = F.col(value_col), value_col
    src = df.select(elem).na.drop()
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError("sample_fraction must be in (0, 1]")
        src = src.sample(fraction=float(sample_fraction), seed=42)
    row = sketch_agg(src, key, (), spec).collect()
    if not row or row[0]["sketch"] is None:
        raise ValueError(f"no non-null rows in column {value_col!r}")
    return boundaries_from_blob(bytes(row[0]["sketch"]), num_buckets, spec)


def bucket_expr(value_col: str | Column, boundaries: Sequence[float]) -> Column:
    """searchsorted-right bucket id as an O(log B) codegen WHEN-tree.

    bucket(v) = #{i : boundaries[i] <= v}; NULL -> 0, NaN -> B-1 (every
    tree node's ``v < b`` is false for NaN, so NaN falls to the rightmost
    leaf — consistent with Spark sorting NaN after all doubles).

    ±inf boundaries are legal (a column with >= 1/B of its mass at ±inf
    puts infinities in the quantile set): ``v < lit(±inf)`` evaluates
    exactly like searchsorted against an infinite boundary, the buckets
    between equal infinite boundaries are simply empty.  Only NaN
    boundaries are rejected — a NaN poisons every tree comparison."""
    b = np.asarray(boundaries, dtype=np.float64)
    if b.shape[0] == 0:
        raise ValueError("need at least one boundary")
    if b.shape[0] + 1 > MAX_BUCKETS:
        # the WHEN tree and relabel array are PLAN literals: an unbounded
        # boundary list blows up driver analysis/codegen, so enforce the
        # module cap on every entry point, not just boundaries_from_blob
        raise ValueError(f"too many boundaries: {b.shape[0] + 1} buckets "
                         f"> MAX_BUCKETS={MAX_BUCKETS}")
    if np.any(np.isnan(b)):
        raise ValueError("boundaries must not contain NaN")
    if np.any(b[1:] < b[:-1]):  # NaN-free, so plain compare == ascending
        raise ValueError("boundaries must be ascending")
    col = F.col(value_col) if isinstance(value_col, str) else value_col

    def tree(lo: int, hi: int) -> Column:
        # invariant: bucket in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        # v < b[mid]  <=>  #{b_i <= v} <= mid  (b ascending)
        return (F.when(col < F.lit(float(b[mid])), tree(lo, mid))
                .otherwise(tree(mid + 1, hi)))

    return F.when(col.isNull(), F.lit(0)).otherwise(tree(0, int(b.shape[0])))


# relabel tables are a pure function of the bucket count (Spark's hash()
# is pinned Murmur3, seed 42), so a pipeline writing many datasets at the
# same B pays the coupon-collector probe job once, not per call
_RELABEL_CACHE: dict[int, np.ndarray] = {}
_RELABEL_CACHE_MAX = 8  # 64Ki-bucket table = 512 KB


def hash_preimage_relabel(spark: SparkSession, num_buckets: int) -> np.ndarray:
    """relabel[j] = smallest int v with pmod(hash(v), B) == j, probed
    through Spark's own ``hash()`` expression so it matches
    ``HashPartitioning`` bit-for-bit.  Coupon-collector: ~B ln B probes;
    runs as one single-partition job over a driver-sized range, memoized
    per bucket count."""
    cached = _RELABEL_CACHE.get(num_buckets)
    if cached is not None:
        return cached
    relabel = np.full(num_buckets, -1, dtype=np.int64)
    lo, found = 0, 0
    while found < num_buckets:
        chunk = max(256, 4 * num_buckets)
        rows = (spark.range(lo, lo + chunk, 1, 1)
                .select(F.col("id").cast("int").alias("v"),
                        F.pmod(F.hash(F.col("id").cast("int")),
                               F.lit(num_buckets)).alias("j"))
                .collect())
        for r in rows:
            j = int(r["j"])
            if relabel[j] < 0:
                relabel[j] = int(r["v"])
                found += 1
        lo += chunk
        if lo > 1_000_000 * max(1, num_buckets // 256):  # pragma: no cover
            raise RuntimeError("hash preimage probe failed to converge")
    if len(_RELABEL_CACHE) >= _RELABEL_CACHE_MAX:
        _RELABEL_CACHE.pop(next(iter(_RELABEL_CACHE)))
    # freeze: the memo hands out the SAME array object on every call, so a
    # caller mutating it (sorting, reusing as scratch) would silently
    # poison every later repartition at this bucket count
    relabel.flags.writeable = False
    _RELABEL_CACHE[num_buckets] = relabel
    return relabel


def repartition_by_boundaries(df: DataFrame, value_col: str,
                              boundaries: Sequence[float],
                              bucket_col: str | None = None,
                              sort_within: bool = False,
                              str_skip: int | None = None) -> DataFrame:
    """Exactly B = len(boundaries)+1 output partitions, partition j holding
    precisely bucket j's rows (hash-preimage relabel), optional
    sortWithinPartitions for a global sort.  One shuffle, no sampling job;
    AQE does not coalesce an explicit numPartitions repartition, so the
    bucket<->partition bijection survives adaptive re-planning.  For a
    string column, ``str_skip`` must match the value the boundaries were
    built with (auto-recomputed from the same min/max if omitted)."""
    b = np.asarray(boundaries, dtype=np.float64)
    num_buckets = int(b.shape[0]) + 1
    if not 2 <= num_buckets <= MAX_BUCKETS:  # fail before the probe job
        raise ValueError(f"num_buckets must be in [2, {MAX_BUCKETS}]")
    relabel = hash_preimage_relabel(df.sparkSession, num_buckets)
    if _is_string(df, value_col):
        skip = (str_common_prefix_len(df, value_col) if str_skip is None
                else int(str_skip))
        key = str_order_key(value_col, skip)
    else:
        key = F.col(value_col)
    bucket = bucket_expr(key, b)
    keep = bucket_col or "__range_bucket"
    # __relabel references the MATERIALIZED bucket column, not the raw
    # bucket expression: at B=65536 the O(B) WHEN-tree would otherwise be
    # embedded twice in the plan (once per withColumn), doubling analysis
    # and codegen cost.  CollapseProject keeps the projections split here
    # because `keep` is referenced twice (pass-through + inside __relabel)
    # and the tree is not cheap.
    relabeled = F.get(F.array(*[F.lit(int(v)) for v in relabel]),
                      F.col(keep))
    out = (df.withColumn(keep, bucket)
           .withColumn("__relabel", relabeled)
           .repartition(num_buckets, F.col("__relabel"))
           .drop("__relabel"))
    if sort_within:
        out = out.sortWithinPartitions(value_col)
    return out if bucket_col else out.drop(keep)


def balanced_sort(df: DataFrame, value_col: str, num_partitions: int,
                  spec=None, blob: bytes | None = None,
                  sample_fraction: float | None = None) -> DataFrame:
    """Globally sorted df (partition i's values all precede partition
    i+1's) in one shuffle.  Pass ``blob`` (an existing KLL/t-digest blob
    for the column, e.g. from ``spark/profile.py``) to skip the boundary
    scan entirely (numeric columns only — a string column's key space
    depends on the LCP skip)."""
    skip = None
    if _is_string(df, value_col):
        if blob is not None:
            raise ValueError("profile-blob reuse is numeric-only: a string "
                             "column's order-key space depends on the LCP")
        skip = str_common_prefix_len(df, value_col)
    b = (boundaries_from_blob(blob, num_partitions, spec) if blob is not None
         else kll_boundaries(df, value_col, num_partitions, spec,
                             str_skip=skip, sample_fraction=sample_fraction))
    return repartition_by_boundaries(df, value_col, b, sort_within=True,
                                     str_skip=skip)


# -- range-partitioned parquet layout: write sorted, read pruned -----------
#
# The payoff of a balanced_sort at rest: each output partition becomes one
# parquet file covering a disjoint value range, so a range predicate needs
# only the overlapping FILES — the data-skipping half of an Iceberg
# sort-order on plain parquet (the Iceberg runtime jar is absent in this
# environment; see SURVEY §6).  File bounds come from the parquet FOOTERS
# (driver-side, no data read).  Footer min/max stats are valid bounds even
# when writers truncate long strings: the parquet spec requires a
# truncated max to be incremented past the true max and a truncated min to
# be a prefix (<= true min), so overlap tests stay conservative.

def _pyarrow_uri(path: str) -> str:
    """Translate Hadoop-connector scheme spellings pyarrow does not know
    (s3a://, s3n://) to the pyarrow-native s3:// before FileSystem.from_uri
    — Spark writes s3a:// fine, and the guard/scan must not reject it."""
    for alias in ("s3a://", "s3n://"):
        if path.startswith(alias):
            return "s3://" + path[len(alias):]
    return path


def _part_files(path: str):
    """(filesystem, [(arrow_path, spark_uri)]) for a local dir or a remote
    URI (hdfs://, s3a://, ...) via pyarrow.fs — raises up front for schemes
    pyarrow cannot reach, so callers can fail BEFORE an expensive write.

    ``arrow_path`` is the filesystem-native path pyarrow opens;
    ``spark_uri`` is the full URI ``spark.read.parquet`` resolves (pyarrow
    FileInfo.path is scheme-stripped — 's3://b/d/f' lists as 'b/d/f' — so
    handing it to Spark would resolve against the DEFAULT filesystem and
    read the wrong place or nothing)."""
    if "://" not in path or path.startswith("file:"):
        import glob as _glob
        local = path
        if local.startswith("file:"):
            # Hadoop emits both file:///x and the single-slash file:/x
            local = local[5:]
            if local.startswith("//"):
                local = local[2:]
            if not local.startswith("/"):  # pragma: no cover
                local = "/" + local
        files = sorted(_glob.glob(os.path.join(local, "part-*.parquet")))
        return None, [(f, f) for f in files]
    from pyarrow import fs as pafs

    # raises for schemes pyarrow cannot reach
    fs, base = pafs.FileSystem.from_uri(_pyarrow_uri(path))
    infos = fs.get_file_info(pafs.FileSelector(base, recursive=False))
    arrow_paths = sorted(i.path for i in infos if i.is_file
                         and os.path.basename(i.path).startswith("part-")
                         and i.path.endswith(".parquet"))
    # rebuild Spark-readable URIs in the CALLER's scheme spelling: for
    # path-based filesystems (hdfs://host:port/dir) the listed path keeps
    # the leading '/' and drops the authority; for bucket-based ones
    # (s3://bucket/dir) the bucket is the first path segment
    scheme, rest = path.split("://", 1)
    authority = rest.split("/", 1)[0]
    pairs = []
    for p in arrow_paths:
        if p.startswith("/"):
            pairs.append((p, f"{scheme}://{authority}{p}"))
        else:
            pairs.append((p, f"{scheme}://{p}"))
    return fs, pairs


def scan_footers(path: str, value_col: str) -> list[dict]:
    """Per-file [lo, hi] bounds + row counts for ``value_col`` from parquet
    footers only.  Files whose footer lacks stats get null bounds and are
    never pruned.  Works on local dirs and any pyarrow-reachable URI."""
    import pyarrow.parquet as pq

    fs, files = _part_files(path)
    out = []
    is_float = False
    for arrow_path, f in files:
        if fs is None:
            md = pq.ParquetFile(arrow_path).metadata
        else:
            with fs.open_input_file(arrow_path) as fh:
                md = pq.ParquetFile(fh).metadata
        # LEAF index, not the Arrow top-level field index: parquet flattens
        # nested columns into one leaf each, so any struct column BEFORE
        # value_col would shift the positions and silently read another
        # column's stats (wrong bounds -> wrong pruning).  A top-level
        # primitive column's path_in_schema is exactly its name.
        ci = next((i for i in range(md.num_columns)
                   if md.schema.column(i).path == value_col), -1)
        if ci < 0:
            raise ValueError(f"column {value_col!r} not a leaf column of {f}")
        is_float = md.schema.column(ci).physical_type in ("FLOAT", "DOUBLE")
        lo = hi = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            mn, mx = st.min, st.max
            if any(isinstance(x, float) and x != x for x in (mn, mx)):
                # a NaN min/max (Spark's writer embeds NaN; the parquet
                # spec leaves NaN stats undefined) does not order against
                # anything — Python's `nan >= lo` is False, so a stats
                # comparison would wrongly prune the file for EVERY
                # bound.  Treat the file as unbounded: never pruned.
                lo = hi = None
                break
            if isinstance(mn, bytes):
                mn, mx = mn.decode("utf-8", "surrogateescape"), \
                    mx.decode("utf-8", "surrogateescape")
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        out.append({"file": f, "lo": lo, "hi": hi, "rows": md.num_rows,
                    "float": is_float})
    if not out:
        raise ValueError(f"no parquet part files under {path}")
    return out


def write_range_partitioned(df: DataFrame, value_col: str, path: str,
                            num_files: int, spec=None,
                            blob: bytes | None = None,
                            sample_fraction: float | None = None,
                            mode: str = "error") -> list[dict]:
    """balanced_sort + write: ``num_files`` parquet files, file i sorted
    and covering a disjoint range below file i+1's.  Returns the footer
    manifest (pass it to ``read_range_pruned`` to skip the footer scan)."""
    if "://" in path and not path.startswith("file:"):
        from pyarrow import fs as pafs
        # unreachable scheme? raise BEFORE the expensive sort+write, not
        # at the footer scan after it (s3a/s3n spellings translated —
        # Spark accepts them even though pyarrow does not)
        pafs.FileSystem.from_uri(_pyarrow_uri(path))
    out = balanced_sort(df, value_col, num_files, spec=spec, blob=blob,
                        sample_fraction=sample_fraction)
    out.write.mode(mode).parquet(path)
    return scan_footers(path, value_col)


def read_range_pruned(spark: SparkSession, path: str, value_col: str,
                      lo=None, hi=None,
                      manifest: list[dict] | None = None) -> DataFrame:
    """Rows with ``lo <= value_col <= hi`` (either bound may be None),
    reading only the files whose footer range overlaps.  The residual
    filter still applies per row (file bounds are coarse), and NULL values
    never match — WHERE semantics.

    NaN (float columns): Spark compares NaN GREATER than every double, so
    NaN rows match whenever the upper bound is open — but parquet footer
    stats exclude NaN, so stats alone cannot prove a file NaN-free.  The
    writer in this module sorts NaN into the LAST file (``bucket_expr``
    sends NaN to bucket B-1); pruning therefore always keeps the top file
    of a float column when NaN rows could match.  For foreign layouts
    that scatter NaN across files, pass every file's bounds as
    ``lo=None`` (or filter unpruned) — footers cannot localize NaN."""
    manifest = manifest if manifest is not None else \
        scan_footers(path, value_col)

    def _nan(x) -> bool:
        return isinstance(x, float) and x != x

    # pruning bounds may differ from the residual-filter bounds: NaN
    # bounds don't order against footer stats (Spark: NaN > everything)
    prune_lo, prune_hi = lo, hi
    if _nan(hi):  # v <= NaN is true for every non-null v in Spark
        prune_hi = None
    nan_rows_match = prune_hi is None  # NaN >= lo always; NaN <= hi never
    if _nan(lo):  # v >= NaN matches ONLY NaN rows
        prune_lo = float("inf")  # just top-of-range + NaN-candidate files
    keep = [m["file"] for m in manifest
            if (m["lo"] is None or prune_hi is None or m["lo"] <= prune_hi)
            and (m["hi"] is None or prune_lo is None
                 or m["hi"] >= prune_lo)]
    if nan_rows_match and any(m.get("float") for m in manifest):
        # the file holding the greatest hi is where this module's writer
        # places NaN rows; stats can't prove it NaN-free, so keep it
        bounded = [m for m in manifest if m["hi"] is not None]
        if bounded:
            top = max(bounded, key=lambda m: m["hi"])["file"]
            if top not in keep:
                keep.append(top)
    if not keep:
        return (spark.read.parquet(manifest[0]["file"])
                .filter(F.lit(False)))
    out = spark.read.parquet(*keep)
    if lo is not None:
        out = out.filter(F.col(value_col) >= lo)
    if hi is not None:
        out = out.filter(F.col(value_col) <= hi)
    return out
