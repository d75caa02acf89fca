"""Sketch-spec bindings for the two-stage aggregation in
:mod:`sketchlib.spark.aggregate`.

A spec adapts one pure-numpy sketch to the partial-build / shuffle-merge /
estimate pipeline. ``HllSpec`` lives in :mod:`sketchlib.spark.aggregate` for
historical reasons; the sibling sketches bind here. Every spec is a small
picklable value object (it is captured in UDF closures shipped to executors).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from ..bloom import BloomFilter
from ..cms import CountMinSketch
from .aggregate import hash_columns


class BloomSpec:
    """Bloom membership sketch: set semantics -> dedup-able stage 1."""

    name = "bloom"
    hash_dedup = True
    estimate_type = T.LongType()

    def __init__(self, m_bits: int = 1 << 20, k: int = 7,
                 hash_name: str = "murmur3") -> None:
        self.m_bits = m_bits
        self.k = k
        self.hash_name = hash_name

    def make(self) -> BloomFilter:
        return BloomFilter(m_bits=self.m_bits, k=self.k)

    def prepare(self, pdf: pd.DataFrame, element_cols: Sequence[str]) -> np.ndarray:
        return hash_columns(pdf, element_cols, self.hash_name)

    def ingest(self, sketch: BloomFilter, prepared: np.ndarray) -> None:
        sketch.add_hashes(prepared)

    def build_from_hashes(self, unique_hashes: np.ndarray,
                          count_additions: int) -> BloomFilter:
        bf = self.make()
        bf.add_hashes(unique_hashes)
        bf.count_additions = count_additions
        return bf

    def to_bytes(self, sketch: BloomFilter) -> bytes:
        return sketch.to_bytes()

    def from_bytes(self, blob: bytes) -> BloomFilter:
        return BloomFilter.from_bytes(blob)

    def merge(self, a: BloomFilter, b: BloomFilter) -> BloomFilter:
        a.merge(b)
        return a

    def estimate(self, sketch: BloomFilter) -> int:
        return sketch.estimate_cardinality()


class CmsSpec:
    """Count-min frequency sketch: multiplicities matter -> streaming stage 1
    (``hash_dedup = False``); merge = cell-wise sum."""

    name = "cms"
    hash_dedup = False
    estimate_type = T.LongType()

    def __init__(self, width: int = 1 << 12, depth: int = 5,
                 hash_name: str = "murmur3") -> None:
        self.width = width
        self.depth = depth
        self.hash_name = hash_name

    def make(self) -> CountMinSketch:
        return CountMinSketch(width=self.width, depth=self.depth)

    def prepare(self, pdf: pd.DataFrame, element_cols: Sequence[str]) -> np.ndarray:
        return hash_columns(pdf, element_cols, self.hash_name)

    def ingest(self, sketch: CountMinSketch, prepared: np.ndarray) -> None:
        sketch.add_hashes(prepared)

    def to_bytes(self, sketch: CountMinSketch) -> bytes:
        return sketch.to_bytes()

    def from_bytes(self, blob: bytes) -> CountMinSketch:
        return CountMinSketch.from_bytes(blob)

    def merge(self, a: CountMinSketch, b: CountMinSketch) -> CountMinSketch:
        a.merge(b)
        return a

    def estimate(self, sketch: CountMinSketch) -> int:
        """Scalar summary = total stream length N (point queries go through
        :func:`sketchlib.spark.heavy_hitters.estimate_counts`)."""
        return sketch.count_additions
