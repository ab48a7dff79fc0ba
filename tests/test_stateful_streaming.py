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
