"""Spark integration: two-stage mergeable sketch aggregation, estimate UDFs,
skew handling, checkpoint/resume.  Everything is DataFrame-native; Python
executes only inside Arrow-batched Pandas UDFs (no per-row Python)."""

from .aggregate import (  # noqa: F401
    HllSpec,
    build_partials,
    distinct_count,
    estimate_col,
    merge_partials,
    sketch_agg,
)
from .specs import BloomSpec, CmsSpec, KllSpec, TDigestSpec, ThetaSpec  # noqa: F401
