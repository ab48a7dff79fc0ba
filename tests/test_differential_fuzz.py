"""Seeded differential fuzz: random filter/group/agg shapes executed on
Spark and DuckDB from one AST must match exactly (tools/fuzz_differential).
A fixed seed keeps CI deterministic; the standalone tool takes any seed."""

from __future__ import annotations

import duckdb

from tools.fuzz_differential import (
    TABLES,
    gen_case,
    normalize,
    run_duckdb,
    run_spark,
)

SF = "/root/testdata/sf0.001"


def test_differential_fuzz_30_cases(spark):
    import random

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    rng = random.Random(1234)
    for i in range(30):
        case = gen_case(rng)
        a = normalize(run_spark(spark, SF, case))
        b = normalize(run_duckdb(con, case))
        assert a == b, (i, case)
