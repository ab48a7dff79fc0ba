"""Custom stateful operator (streaming/stateful.py): session windows with
applyInPandasWithState, driven through a real streaming query."""

from __future__ import annotations

import os

from etl_weather_jabar_spark.streaming.stateful import sessionize_stream


def test_stateful_sessionizer(spark, tmp_path):
    # tmp_path (not TemporaryDirectory): pytest cleans up lazily, so a
    # query that outlives awaitTermination under load can't race rmtree
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # user 1: two events 10 min apart (one session), then one 2 h later
    # (new session). user 2: single event.
    rows = [
        (1, "2024-02-01 08:00:00"),
        (1, "2024-02-01 08:10:00"),
        (1, "2024-02-01 10:30:00"),
        (2, "2024-02-01 09:00:00"),
    ]
    with open(f"{src}/events.csv", "w") as f:
        f.write("\n".join(f"{u},{t}" for u, t in rows))
    stream = (
        spark.readStream.schema("user_id LONG, event_ts TIMESTAMP")
        .csv(src)
    )
    sessions = sessionize_stream(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # The query does NOT self-terminate: ProcessingTimeTimeout timers
    # (gap = 30 min) keep it alive to close open sessions later. Poll the
    # sink for the 3 expected session rows, then stop explicitly.
    import time

    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if spark.sql("select * from sessions_test").count() >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = spark.sql("select * from sessions_test").collect()
    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1 → two sessions: one closed (2 events), one open (1 event)
    u1 = sorted(by_user[1], key=lambda r: r["session_start"])
    assert len(u1) == 2
    assert u1[0]["n_events"] == 2 and u1[0]["status"] == "closed"
    assert str(u1[0]["session_start"]).startswith("2024-02-01 08:00")
    assert str(u1[0]["session_end"]).startswith("2024-02-01 08:10")
    assert u1[1]["n_events"] == 1 and u1[1]["status"] == "open"
    # user 2 → one open session of one event
    assert len(by_user[2]) == 1 and by_user[2][0]["n_events"] == 1


def test_event_time_sessionizer_closes_on_watermark(spark, tmp_path):
    """EventTimeTimeout: the session closes when the WATERMARK (not wall
    clock) passes last_event + gap. Two files + maxFilesPerTrigger=1 force
    two micro-batches so the watermark advances between them."""
    import time

    from etl_weather_jabar_spark.streaming.stateful import (
        sessionize_stream_event_time,
    )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # batch 1: user 1's session (08:00-08:10); user 2 event at 11:00 pushes
    # the watermark far past 08:10 + 30min once batch 2 commits timers
    with open(f"{src}/b1.csv", "w") as f:
        f.write(
            "1,2024-02-01 08:00:00\n"
            "1,2024-02-01 08:10:00\n"
            "2,2024-02-01 11:00:00\n"
        )
    time.sleep(1.1)  # later mtime -> file source orders b2 second
    with open(f"{src}/b2.csv", "w") as f:
        f.write("2,2024-02-01 11:05:00\n")
    stream = (
        spark.readStream.schema("user_id LONG, event_ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    sessions = sessionize_stream_event_time(
        stream, gap_seconds=1800, watermark="0 seconds"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("et_sessions_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if spark.sql("select * from et_sessions_test").count() >= 1:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = spark.sql("select * from et_sessions_test").collect()
    # user 1's session closed by the watermark; user 2's still open -> absent
    assert [(r["user_id"], r["n_events"], r["status"]) for r in got] == [
        (1, 2, "closed")
    ]
    r = got[0]
    assert str(r["session_start"]) == "2024-02-01 08:00:00"
    assert str(r["session_end"]) == "2024-02-01 08:10:00"
