"""Custom stateful operator (streaming/stateful.py): session windows with
applyInPandasWithState, driven through a real streaming query."""

from __future__ import annotations

import tempfile

from etl_weather_jabar_spark.streaming.stateful import sessionize_stream


def test_stateful_sessionizer(spark):
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        import os

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
        q.awaitTermination(120)
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
