"""Sessionization: gaps-and-islands correctness vs a python transcription,
timestamp-tie stability under repartitioning, exact durations, and the
streaming session_window path with watermark finalization."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sketchlib.spark.sessions import session_stats, sessionize

GAP = 1800  # 30 min


def _brute_sessions(rows, gap_s=GAP):
    """{user: [(n_events, duration_us), ...] in time order}"""
    by_user = {}
    for uid, us in rows:
        by_user.setdefault(uid, []).append(us)
    out = {}
    for uid, times in by_user.items():
        times.sort()
        sessions = [[times[0]]]
        for t in times[1:]:
            if t - sessions[-1][-1] > gap_s * 1_000_000:
                sessions.append([])
            sessions[-1].append(t)
        out[uid] = [(len(s), s[-1] - s[0]) for s in sessions]
    return out


class TestBatchSessions:
    def test_matches_brute_force(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = session_stats(ev, gap_seconds=GAP).collect()
        from sketchlib.spark.sessions import _epoch_us
        raw = [(r["user_id"], r["us"]) for r in
               ev.select("user_id", _epoch_us(ev, "ts").alias("us")).collect()]
        want = _brute_sessions(raw)
        by_user = {}
        for r in got:
            by_user.setdefault(r["user_id"], []).append(
                (r["session_idx"], r["n_events"], r["duration_us"]))
        assert set(by_user) == set(want)
        for uid, sess in by_user.items():
            sess.sort()
            assert [s[0] for s in sess] == list(range(1, len(sess) + 1))
            assert [(n, d) for _, n, d in sess] == want[uid]

    def test_partition_invariant_and_tie_stable(self, spark):
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        rows = [
            (1, t0), (1, t0), (1, t0),                      # 3-way ts tie
            (1, t0 + dt.timedelta(minutes=10)),
            (1, t0 + dt.timedelta(minutes=50)),             # new session
            (1, t0 + dt.timedelta(minutes=50)),             # tie at boundary
            (2, t0),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        expected = {(1, 1, 4), (1, 2, 2), (2, 1, 1)}
        for parts in (1, 7):
            got = {(r["user_id"], r["session_idx"], r["n_events"])
                   for r in session_stats(df.repartition(parts),
                                          gap_seconds=GAP).collect()}
            assert got == expected

    def test_epoch_us_exact_on_ntz(self, spark):
        """The NTZ epoch-µs derivation is exact to the microsecond.  Pins
        the DayTimeInterval-casts-to-SECONDS trap: a naive
        (ts - epoch).cast('long') silently loses the 10^6 factor and
        collapses every user to one session."""
        from sketchlib.spark.sessions import _epoch_us

        # the pre-epoch fractional rows pin the second trap: toward-zero
        # interval truncation + a positive sub-second fraction would give
        # +500000 instead of -500000 for 1969-12-31 23:59:59.5
        samples = ("2026-01-01 00:00:01.500001", "1999-12-31 23:59:59.999999",
                   "1969-12-31 23:59:59.500000", "1969-12-31 00:00:00.250000",
                   "1970-01-01 00:00:00.000000")
        df = spark.createDataFrame(
            [(s,) for s in samples],
            "s string").select(F.col("s").cast("timestamp_ntz").alias("ts"))
        got = sorted(r[0] for r in df.select(_epoch_us(df, "ts")).collect())
        def us(s):  # integer arithmetic: float total_seconds() loses µs
            td = dt.datetime.fromisoformat(s) - dt.datetime(1970, 1, 1)
            return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds

        want = sorted(us(s) for s in samples)
        assert got == want

    def test_null_rows_dropped(self, spark):
        t0 = dt.datetime(2026, 1, 1)
        df = spark.createDataFrame(
            [(1, t0), (None, t0), (1, None)], "user_id long, ts timestamp")
        got = sessionize(df).collect()
        assert len(got) == 1 and got[0]["session_idx"] == 1

    def test_exact_boundary_is_same_session(self, spark):
        """Gap STRICTLY greater than the threshold starts a session; an
        event exactly gap_seconds later stays in the same session — the
        semantics Spark's session_window exhibits (it MERGES sessions
        whose [start, last+gap) ranges touch), empirically pinned by
        test_boundary_parity_with_streaming."""
        t0 = dt.datetime(2026, 1, 1)
        df = spark.createDataFrame(
            [(1, t0), (1, t0 + dt.timedelta(seconds=GAP)),
             (1, t0 + dt.timedelta(seconds=2 * GAP + 1))],
            "user_id long, ts timestamp")
        [r1, r2] = sorted(session_stats(df, gap_seconds=GAP).collect(),
                          key=lambda r: r["session_idx"])
        assert (r1["n_events"], r2["n_events"]) == (2, 1)

    def test_boundary_parity_with_streaming(self, spark, tmp_path):
        """Batch and streaming sessionizers agree on an exact-gap event."""
        import datetime as dt

        from sketchlib.spark.sessions import streaming_session_stats

        t0 = dt.datetime(2026, 1, 1, 8, 0, 0)
        rows = [(1, t0), (1, t0 + dt.timedelta(seconds=GAP)),
                (9, t0 + dt.timedelta(hours=30))]  # watermark pusher
        schema = "user_id long, ts timestamp"
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        collected = []

        def run_pass():
            stream = spark.readStream.schema(schema).parquet(src)
            agg = streaming_session_stats(stream, gap_seconds=GAP,
                                          watermark_delay="1 hour")
            q = (agg.writeStream
                 .foreachBatch(
                     lambda bdf, _b: collected.extend(bdf.collect()))
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            assert q.awaitTermination(120)

        spark.createDataFrame(rows[:2], schema).repartition(1).write.mode(
            "append").parquet(src)
        run_pass()
        spark.createDataFrame(rows[2:], schema).repartition(1).write.mode(
            "append").parquet(src)
        run_pass()
        stream_sessions = sorted(
            (r["session_start"], r["n_events"])
            for r in collected if r["user_id"] == 1)
        batch = session_stats(
            spark.createDataFrame(rows, schema), gap_seconds=GAP)
        batch_sessions = sorted(
            (r["session_start"], r["n_events"])
            for r in batch.collect() if r["user_id"] == 1)
        # session_window MERGES the touching ranges: one session, 2 events
        assert stream_sessions == batch_sessions == [(t0, 2)]


class TestStreamingSessions:
    def test_session_window_finalizes_on_watermark(self, spark, tmp_path):
        from sketchlib.spark.sessions import streaming_session_stats

        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        t0 = dt.datetime(2026, 1, 1, 8, 0, 0)
        early = [(7, t0 + dt.timedelta(minutes=m)) for m in (0, 5, 9)]
        late = [(8, t0 + dt.timedelta(hours=10))]
        schema = "user_id long, ts timestamp"
        collected = []

        def run_pass():
            stream = spark.readStream.schema(schema).parquet(src)
            agg = streaming_session_stats(stream, gap_seconds=GAP,
                                          watermark_delay="1 hour")
            q = (agg.writeStream
                 .foreachBatch(lambda bdf, _b: collected.extend(bdf.collect()))
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            assert q.awaitTermination(120), "streaming pass timed out"

        spark.createDataFrame(early, schema).repartition(1).write.mode(
            "append").parquet(src)
        run_pass()
        # second pass: the 10h-later event advances the watermark past the
        # early session's close, finalizing it
        spark.createDataFrame(late, schema).repartition(1).write.mode(
            "append").parquet(src)
        run_pass()
        done = [r for r in collected if r["user_id"] == 7]
        assert len(done) == 1
        assert done[0]["n_events"] == 3
        assert done[0]["session_start"] == t0
        # session_window closes gap after the LAST event
        assert done[0]["session_end"] == (
            t0 + dt.timedelta(minutes=9, seconds=GAP))
