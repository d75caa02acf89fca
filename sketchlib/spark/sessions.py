"""Event-time sessionization — the classic web-log pipeline operator: group
each user's events into sessions separated by inactivity gaps.

Batch path (``sessionize`` / ``session_stats``): the standard gaps-and-
islands construction, entirely in JVM window expressions — ``lag`` marks
rows whose gap from the previous event exceeds the threshold, a running sum
of the markers numbers the sessions.  ONE shuffle (the window's
``partitionBy(user)``), zero Python.  Deterministic across engines AND
across tie orders: the boundary marker depends only on timestamp
differences, and the running sum uses the default RANGE frame (peers
included), so rows with identical timestamps always land in the same
session no matter how the engine orders them internally.

Streaming path (``streaming_session_stats``): Spark's built-in
``session_window`` state operator — watermark-bounded session merging, the
same gap semantics, state evicted once the watermark passes a session's
close.  This is the 100 TB/continuous shape; the batch path is its
backfill twin.

Skew note: the shuffle key is the user — web logs have bot/hub users.  At
scale, cap or salt known hubs upstream (``cap_per_group``), or pre-filter
users above an event-count bound; the window itself is O(user's events).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Microseconds-since-epoch as a long, for both TIMESTAMP and
    TIMESTAMP_NTZ columns.  The NTZ path never consults a timezone (no
    DST discontinuity can enter the arithmetic): epoch days from the DATE
    part and time-of-day microseconds from the exact DECIMAL
    ``date_part('SECOND')`` field.  Both components use FLOOR semantics
    (date truncation floors; time-of-day is always in [0, 86400s)), so
    pre-epoch fractional timestamps stay exact — the tempting
    epoch-subtraction interval cast truncates TOWARD ZERO as whole
    SECONDS (a documented-by-test trap, see tests) and would pair a
    truncated -0s with a positive +.5s fraction."""
    c = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        days = F.datediff(F.to_date(c),
                          F.lit("1970-01-01").cast("date")).cast("long")
        tod_us = ((F.hour(c).cast("long") * 3600
                   + F.minute(c).cast("long") * 60) * F.lit(1_000_000)
                  + (F.date_part(F.lit("SECOND"), c)
                     * 1_000_000).cast("long"))
        return days * F.lit(86_400_000_000) + tod_us
    return F.unix_micros(c)


def sessionize(df: DataFrame, ts_col: str = "ts", user_col: str = "user_id",
               gap_seconds: int = 1800,
               session_col: str = "session_idx") -> DataFrame:
    """Add ``session_col``: 1-based session number per user in event-time
    order.  Rows with NULL user or NULL timestamp are dropped (they belong
    to no session)."""
    base = df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    us = _epoch_us(base, ts_col)
    w = Window.partitionBy(user_col).orderBy(us)
    gap_us = int(gap_seconds) * 1_000_000
    # STRICT >: session_window's ranges are [start, last + gap) and Spark
    # merges sessions whose ranges TOUCH, so an event arriving exactly
    # `gap` after the previous one stays in the SAME session — pinned
    # empirically by test_boundary_parity_with_streaming (a >= here was
    # tried and diverged from the streaming twin on boundary events).
    new = F.when(
        us - F.lag(us).over(w) > F.lit(gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    # first row per user has NULL lag -> otherwise(0); start numbering at 1
    # via +1 below. Default RANGE frame: timestamp ties share the cumsum.
    return base.withColumn(
        session_col, (F.sum(new).over(w) + F.lit(1)).cast("long"))


def session_stats(df: DataFrame, ts_col: str = "ts",
                  user_col: str = "user_id", gap_seconds: int = 1800,
                  session_col: str = "session_idx") -> DataFrame:
    """One row per (user, session): ``n_events``, ``duration_us`` (exact
    integer microseconds, engine-reproducible), session start/end."""
    s = sessionize(df, ts_col, user_col, gap_seconds, session_col)
    us = _epoch_us(s, ts_col)
    return (s.groupBy(user_col, session_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 (F.max(us) - F.min(us)).alias("duration_us")))


def streaming_session_stats(stream_df: DataFrame, ts_col: str = "ts",
                            user_col: str = "user_id",
                            gap_seconds: int = 1800,
                            watermark_delay: str = "1 hour") -> DataFrame:
    """Streaming sessionization via the built-in ``session_window`` state
    operator: sessions grow/merge as events arrive and finalize once the
    watermark passes their close (state is evicted then — bounded by open
    sessions, not stream length).  Emits one row per closed session in
    append mode: (user, window.start/end, n_events)."""
    gap = f"{int(gap_seconds)} seconds"
    return (stream_df
            .filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
            .withWatermark(ts_col, watermark_delay)
            .groupBy(F.session_window(ts_col, gap).alias("session"),
                     F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(user_col, F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"), "n_events"))
