"""Stateful streaming sketch aggregation.

``streaming_sketch_agg`` turns any mergeable sketch spec into a Structured
Streaming stateful operator via ``applyInPandasWithState``: the group state
is the serialized sketch blob; every micro-batch folds its Arrow batches into
the state sketch (vectorized batch ingest — same hot path as the batch
builder) and emits the updated estimate. Because sketches are tiny and
mergeable, state size is O(sketch) per group no matter how many rows
streamed through — the property that makes sketch aggregation the natural
streaming operator (a true COUNT DISTINCT would need unbounded state).

Restart semantics come from Spark's state store: with a checkpointLocation,
a restarted query resumes from committed state (tested with two
``availableNow`` runs over a growing file source).

Event-time windowing: pre-group by ``F.window(ts, ...)`` — the window struct
is just another group key to the state function; late data is bounded by
``withWatermark`` upstream (state for closed windows can be dropped by the
timeout argument if desired).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("sketch", T.BinaryType())])


def streaming_sketch_agg(stream_df: DataFrame, element_cols, group_cols: Sequence[str],
                         spec, output_mode: str = "update") -> DataFrame:
    """(group_cols..., estimate: long, count_additions: long), updated every
    micro-batch. ``stream_df`` must be a streaming DataFrame."""
    if isinstance(element_cols, str):
        element_cols = [element_cols]
    element_cols = list(element_cols)
    group_cols = list(group_cols)

    est_type = getattr(spec, "estimate_type", T.LongType())
    out_schema = T.StructType(
        [stream_df.schema[g] for g in group_cols]
        + [T.StructField("estimate", est_type),
           T.StructField("count_additions", T.LongType())]
    )
    cast = float if isinstance(est_type, T.DoubleType) else int

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            (blob,) = state.get
            sketch = spec.from_bytes(bytes(blob))
        else:
            sketch = spec.make()
        for pdf in pdfs:
            pdf = pdf.dropna(subset=element_cols)
            if len(pdf):
                spec.ingest(sketch, spec.prepare(pdf, element_cols))
        state.update((spec.to_bytes(sketch),))
        yield pd.DataFrame(
            [list(key) + [cast(spec.estimate(sketch)),
                          int(getattr(sketch, "count_additions", 0))]],
            columns=group_cols + ["estimate", "count_additions"])

    return (stream_df.groupBy(*group_cols)
            .applyInPandasWithState(update, out_schema, _STATE_SCHEMA,
                                    output_mode, GroupStateTimeout.NoTimeout))


def streaming_distinct_count(stream_df: DataFrame, element_cols,
                             group_cols: Sequence[str], p: int = 14) -> DataFrame:
    """Streaming approximate COUNT(DISTINCT ...) per group via HLL state."""
    from ..spark.aggregate import HllSpec

    return streaming_sketch_agg(stream_df, element_cols, group_cols, HllSpec(p=p))
