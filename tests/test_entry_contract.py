"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(REPO, "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "date", "event_type", "value_avg", "value_min", "value_max",
        "value_sum", "n_obs",
    ]


def test_every_oracle_key_has_query():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25


def test_queries_run_and_alias_consistently(spark, all_query_frames):
    """Each query must construct and run its build phase at sf0.001;
    oracle column names must appear in the SQL text (cheap alias-drift
    guard). Construction is shared with the plan-quality gate via the
    session fixture — one registry pass instead of two (round 9)."""
    frames, errors = all_query_frames
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert not errors, f"queries failed to build: {errors}"
    assert set(frames) == set(q)
    for name, df in frames.items():
        cols = df.columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate column names"
        if name in o:
            sql = o[name].lower()
            for c in cols:
                assert c.lower() in sql, f"{name}: column {c} not in oracle SQL"


def test_cli_list_and_run(spark, tmp_path, capsys):
    """python -m etl_weather_jabar_spark: list prints every registry
    name; run executes a query and writes the chosen format without
    collecting to the driver."""
    from etl_weather_jabar_spark.__main__ import main
    from etl_weather_jabar_spark.queries import ALL

    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == list(ALL)

    dest = str(tmp_path / "res")
    rc = main([
        "run", "recap_daily_agg",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", dest, "--format", "csv",
    ])
    assert rc == 0
    got = spark.read.option("header", "true").csv(dest)
    assert got.count() > 0

    assert main(["run", "no_such_query"]) == 2
