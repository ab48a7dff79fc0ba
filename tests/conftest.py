from __future__ import annotations

import pytest

from etl_weather_jabar_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def all_query_frames(spark):
    """EVERY registered query constructed once at sf0.001 — real eager
    construction (builders' sampling jobs, checkpoints and index writes
    run; no full plan executes). Shared by the registry-wide contract
    test and the plan-quality gate, which used to EACH pay their own
    ~4-minute construction pass over the 269-query registry — the
    single biggest reason the suite outgrew the driver's pytest budget
    (round-8 verdict item 2a).

    Returns (frames, errors): {name: DataFrame} for every query whose
    builder succeeded, {name: repr} for any that raised — consumers
    assert errors is empty so a broken builder still fails loudly."""
    from etl_weather_jabar_spark.queries import QUERIES

    frames: dict[str, object] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            frames[name] = fn(spark, "/root/testdata/sf0.001")
        except Exception as e:  # noqa: BLE001 - surfaced in consumers
            errors[name] = repr(e)[:200]
    return frames, errors
