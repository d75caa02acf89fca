"""Structured Streaming sketch aggregation (stateful, incremental)."""

from .dedup import streaming_dedup  # noqa: F401
from .stream_agg import (streaming_distinct_count,  # noqa: F401
                         streaming_sketch_agg, windowed_distinct_count,
                         windowed_sketch_agg)
