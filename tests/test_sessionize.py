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
