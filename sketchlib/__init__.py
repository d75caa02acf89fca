"""sketchlib — a PySpark-native distributed sketch / approximate-aggregation
library: HyperLogLog (reference-compatible), Count-Min, Bloom, t-digest and
KLL as mergeable aggregators over DataFrames.

Layering:

* ``sketchlib.hashing`` / ``sketchlib.encoding`` — vectorized Murmur3/FNV-1a
  and the normative element byte encodings (zero Spark dependency).
* ``sketchlib.hll`` & friends — pure-numpy mergeable sketches, each with
  ``add_* / merge / estimate / to_bytes / from_bytes``.
* ``sketchlib.spark`` — the thin Spark integration: two-stage partial/final
  aggregation built from ``mapInPandas`` + ``groupBy().applyInPandas``,
  estimate ``pandas_udf``s, explicit skew salting, checkpoint/resume.
* ``sketchlib.data`` — deterministic Common-Crawl-style ``pages`` table
  generator and the frozen byte-identical text extraction.
"""

from .hll import HllSketch  # noqa: F401

__version__ = "0.1.0"
