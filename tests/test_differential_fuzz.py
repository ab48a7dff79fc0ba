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


def test_differential_fuzz_new_families(spark):
    """Seeded pass over the r3 families: jointype (semi/anti/full),
    multi-distinct aggregates (Expand), top-k-per-group (qualify)."""
    import random

    from tools.fuzz_differential import (
        gen_jointype_case,
        gen_multidistinct_case,
        gen_qualify_case,
        run_jointype_duckdb,
        run_jointype_spark,
        run_multidistinct_duckdb,
        run_multidistinct_spark,
        run_qualify_duckdb,
        run_qualify_spark,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    rng = random.Random(4321)
    fams = [
        (gen_jointype_case, run_jointype_spark, run_jointype_duckdb),
        (gen_multidistinct_case, run_multidistinct_spark,
         run_multidistinct_duckdb),
        (gen_qualify_case, run_qualify_spark, run_qualify_duckdb),
    ]
    for i in range(12):
        gen, rs, rd = fams[i % 3]
        case = gen(rng)
        a = normalize(rs(spark, SF, case))
        b = normalize(rd(con, case))
        assert a == b, (i, case)


def test_differential_fuzz_filteragg_family(spark):
    """Seeded pass over the r4 family: per-aggregate FILTER predicates
    (DuckDB native FILTER clause vs Spark's conditional-aggregate
    equivalent), including empty-match groups (count→0, sum/min/max→
    NULL)."""
    import random

    from tools.fuzz_differential import (
        gen_filteragg_case,
        run_filteragg_duckdb,
        run_filteragg_spark,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    rng = random.Random(2718)
    for i in range(8):
        case = gen_filteragg_case(rng)
        a = normalize(run_filteragg_spark(spark, SF, case))
        b = normalize(run_filteragg_duckdb(con, case))
        assert a == b, (i, case)
