"""Sessionization tests — batch window expressions vs streaming
applyInPandasWithState must agree on closed sessions."""

import datetime

import pytest

from deequ_spark.streaming.sessionize import (session_stats, sessionize,
                                              sessionize_stream)

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def clicks(spark):
    def at(minute):
        return BASE + datetime.timedelta(minutes=minute)
    rows = [
        (1, at(0)), (1, at(5)), (1, at(10)),      # session 0 (gaps 5m)
        (1, at(60)), (1, at(62)),                 # session 1 (50m gap)
        (1, at(150)),                             # session 2
        (2, at(0)), (2, at(90)),                  # two singleton sessions
    ]
    return spark.createDataFrame(rows, "user long, ts timestamp")


def test_sessionize_assigns_ids(clicks):
    out = sessionize(clicks, "user", "ts", gap_seconds=1800).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["user"], r["ts"])):
        by_user.setdefault(r["user"], []).append(r["session_id"])
    assert by_user[1] == [0, 0, 0, 1, 1, 2]
    assert by_user[2] == [0, 1]


def test_session_stats(clicks):
    stats = {(r["user"], r["session_id"]): r
             for r in session_stats(clicks, "user", "ts", 1800).collect()}
    assert stats[(1, 0)]["n_events"] == 3
    assert stats[(1, 0)]["duration_sec"] == 600.0
    assert stats[(1, 1)]["n_events"] == 2
    assert stats[(2, 0)]["n_events"] == 1


@pytest.fixture(scope="module")
def clicks_ntz(spark):
    """Same events with a TIMESTAMP_NTZ ts column — parquet written with
    isAdjustedToUTC=0 reads back as NTZ, and CAST(NTZ AS DOUBLE) is
    illegal, so sessionize must route through an intermediate TIMESTAMP
    cast (regression: r3 oracle `sessionize` AnalysisException)."""
    def at(minute):
        return BASE + datetime.timedelta(minutes=minute)
    rows = [
        (1, at(0)), (1, at(5)), (1, at(10)),
        (1, at(60)), (1, at(62)),
        (1, at(150)),
        (2, at(0)), (2, at(90)),
    ]
    return spark.createDataFrame(rows, "user long, ts timestamp_ntz")


def test_sessionize_ntz_timestamp(clicks_ntz):
    assert dict(clicks_ntz.dtypes)["ts"] == "timestamp_ntz"
    out = sessionize(clicks_ntz, "user", "ts", gap_seconds=1800).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["user"], r["ts"])):
        by_user.setdefault(r["user"], []).append(r["session_id"])
    assert by_user[1] == [0, 0, 0, 1, 1, 2]
    assert by_user[2] == [0, 1]


def test_session_stats_ntz_timestamp(clicks_ntz):
    stats = {(r["user"], r["session_id"]): r
             for r in session_stats(clicks_ntz, "user", "ts", 1800).collect()}
    assert stats[(1, 0)]["n_events"] == 3
    assert stats[(1, 0)]["duration_sec"] == 600.0
    assert stats[(2, 1)]["n_events"] == 1


def test_sessionize_stream_ntz_timestamp(spark, clicks_ntz, tmp_path):
    """sessionize_stream's __ts_sec projection must also survive NTZ."""
    import os
    src = str(tmp_path / "clicks_ntz")
    os.makedirs(src)
    clicks_ntz.coalesce(1).write.parquet(str(tmp_path / "n0"))
    for f in os.listdir(tmp_path / "n0"):
        if f.endswith(".parquet"):
            os.rename(tmp_path / "n0" / f, f"{src}/part0.parquet")
    flush = spark.createDataFrame(
        [(1, BASE + datetime.timedelta(days=30)),
         (2, BASE + datetime.timedelta(days=30))],
        "user long, ts timestamp_ntz")
    flush.coalesce(1).write.parquet(str(tmp_path / "n1"))
    for f in os.listdir(tmp_path / "n1"):
        if f.endswith(".parquet"):
            os.rename(tmp_path / "n1" / f, f"{src}/part1.parquet")

    stream = (spark.readStream.schema(clicks_ntz.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    closed = sessionize_stream(stream, "user", "ts", gap_seconds=1800)
    q = (closed.writeStream.format("memory").queryName("closed_ntz")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user"], r["n_events"])
           for r in spark.sql("select * from closed_ntz").collect()}
    assert (1, 3) in got and (1, 2) in got and (1, 1) in got
    assert (2, 1) in got


def test_streaming_closed_sessions_match_batch(spark, clicks, tmp_path):
    """Two micro-batches: real clicks, then a far-future sentinel event per
    user that forces every real session to close via the gap rule — all
    deterministic, no wall-clock timeouts."""
    import os
    src = str(tmp_path / "clicks")
    clicks.coalesce(1).write.parquet(str(tmp_path / "c0"))
    flush = spark.createDataFrame(
        [(1, BASE + datetime.timedelta(days=30)),
         (2, BASE + datetime.timedelta(days=30))],
        "user long, ts timestamp")
    flush.coalesce(1).write.parquet(str(tmp_path / "c1"))
    os.makedirs(src)
    for i, d in enumerate(("c0", "c1")):
        for f in os.listdir(tmp_path / d):
            if f.endswith(".parquet"):
                os.rename(tmp_path / d / f, f"{src}/part{i}.parquet")

    stream = (spark.readStream.schema(clicks.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    closed = sessionize_stream(stream, "user", "ts", gap_seconds=1800)
    q = (closed.writeStream.format("memory").queryName("closed_sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user"], r["session_start"], r["n_events"])
           for r in spark.sql("select * from closed_sessions").collect()}
    expected = {(r["user"], r["session_start"].timestamp(), r["n_events"])
                for r in session_stats(clicks, "user", "ts", 1800).collect()}
    assert got == expected


def test_sessionize_ntz_dst_fallback(spark):
    """NTZ wall-clock differences must not be warped by a DST transition
    in the session timezone (r4 advice): events 30 wall-minutes apart
    straddling the America/New_York 2025-11-02 fall-back would map to
    instants 90 minutes apart under a session-zone cast, wrongly
    splitting a gap<=1800s session. The field-arithmetic NTZ path is
    zone-free, so the three events stay one session in ANY zone."""
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [(1, datetime.datetime(2025, 11, 2, 1, 15)),
                (1, datetime.datetime(2025, 11, 2, 1, 45)),
                (1, datetime.datetime(2025, 11, 2, 2, 15))]
        df = spark.createDataFrame(rows, "user long, ts timestamp_ntz")
        out = sessionize(df, "user", "ts", gap_seconds=1800).collect()
        assert sorted(r["session_id"] for r in out) == [0, 0, 0]
        stats = session_stats(df, "user", "ts", 1800).collect()
        assert len(stats) == 1
        assert stats[0]["duration_sec"] == 3600.0  # pure wall-clock
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
