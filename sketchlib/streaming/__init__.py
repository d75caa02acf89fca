"""Structured Streaming sketch aggregation (stateful, incremental)."""

from .stream_agg import streaming_distinct_count, streaming_sketch_agg  # noqa: F401
