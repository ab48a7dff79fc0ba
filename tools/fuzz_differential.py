"""Differential query fuzzer: random filter/group/aggregate shapes built
from ONE seeded AST, rendered both as a Spark DataFrame plan and as DuckDB
SQL, executed on the same parquet, results compared exactly.

The hand-written registry pins ~160 curated shapes; this closes the gap
BETWEEN them — operator compositions nobody thought to write down. Every
generated aggregate follows the engine-wide determinism rules (counts,
integer-unit sums via round(x*100), min/max on raw values), so any
mismatch is a real semantics bug, not float noise.

    python tools/fuzz_differential.py [sf_dir] [n_cases] [seed]

Exit 0 iff every case matches; prints each failing case's AST.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (table, numeric cols (int-like), cents cols (2dp doubles), string cols)
TABLES = {
    "orders": (
        ["o_orderkey", "o_custkey"],
        ["o_totalprice"],
        ["o_orderstatus", "o_orderpriority"],
    ),
    "lineitem": (
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        ["l_extendedprice", "l_tax"],
        ["l_returnflag", "l_linestatus"],
    ),
    "events": (
        ["event_id", "user_id"],
        ["value"],
        ["event_type"],
    ),
    "customer": (
        ["c_custkey", "c_nationkey"],
        ["c_acctbal"],
        ["c_mktsegment"],
    ),
}

# (left, right, left key, right key) equi-join shapes; inner/left fuzzed
JOINS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
]

# window fuzzing needs a unique key for a TOTAL order (deterministic
# row_number/lag under any parallelism): table -> (unique key, part col,
# order col)
WINDOWABLE = {
    "orders": ("o_orderkey", "o_orderstatus", "o_custkey"),
    "events": ("event_id", "event_type", "user_id"),
    "customer": ("c_custkey", "c_mktsegment", "c_nationkey"),
}

CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]


def gen_window_case(rng: random.Random) -> dict:
    """A window-function shape: row_number / rank / lag / running sum over
    (partition by a string col, order by an int col with a unique-key
    tie-break) — total order, so every output row is deterministic."""
    table = rng.choice(sorted(WINDOWABLE))
    uk, part, order = WINDOWABLE[table]
    fns = rng.sample(["row_number", "rank", "lag", "runsum"], k=rng.randrange(1, 4))
    return {"kind": "window", "table": table, "uk": uk, "part": part,
            "order": order, "fns": fns, "limit_mod": rng.randrange(2, 7)}


def run_window_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from etl_weather_jabar_spark.sources.parquet import load_table

    df = load_table(spark, sf_dir, case["table"]).where(
        F.col(case["uk"]) % case["limit_mod"] == 0
    )
    w = W.partitionBy(case["part"]).orderBy(case["order"], case["uk"])
    cols = [F.col(case["uk"]).alias("uk")]
    for fn in case["fns"]:
        if fn == "row_number":
            cols.append(F.row_number().over(w).alias("rn"))
        elif fn == "rank":
            cols.append(F.rank().over(w).alias("rk"))
        elif fn == "lag":
            cols.append(F.lag(case["uk"], 1).over(w).alias("lg"))
        else:
            cols.append(
                F.sum(case["order"])
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                .alias("rs")
            )
    return sorted(map(tuple, df.select(*cols).collect()))


def run_window_duckdb(con, case: dict):
    over = (f"OVER (PARTITION BY {case['part']} "
            f"ORDER BY {case['order']}, {case['uk']})")
    sel = [f"{case['uk']} AS uk"]
    for fn in case["fns"]:
        if fn == "row_number":
            sel.append(f"row_number() {over} AS rn")
        elif fn == "rank":
            sel.append(f"rank() {over} AS rk")
        elif fn == "lag":
            sel.append(f"lag({case['uk']}, 1) {over} AS lg")
        else:
            sel.append(
                f"sum({case['order']}) OVER (PARTITION BY {case['part']} "
                f"ORDER BY {case['order']}, {case['uk']} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs"
            )
    sql = (f"SELECT {', '.join(sel)} FROM {case['table']} "
           f"WHERE {case['uk']} % {case['limit_mod']} = 0")
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_ntile_case(rng: random.Random) -> dict:
    """Family 14: the zero-exchange boundary-expression ntile
    (operators/windows.py::ntile_by_boundaries) vs native SQL ntile over
    a total order with heavy ties — random table, tie density, tile
    count, and a row filter so tiny/empty inputs are drawn too."""
    table, uk = rng.choice(
        [("orders", "o_orderkey"), ("events", "event_id"),
         ("customer", "c_custkey")]
    )
    ints = TABLES[table][0]
    return {
        "kind": "ntile",
        "table": table,
        "uk": uk,
        "v": rng.choice(ints),
        "mod": rng.randrange(2, 60),
        "n": rng.randrange(1, 10),
        "limit_mod": rng.randrange(1, 9),
        # nullify one residue class of the order value: SQL ntile sorts
        # NULLS FIRST — the boundary-compare path must agree
        "null_res": rng.randrange(0, 60) if rng.random() < 0.5 else None,
    }


def run_ntile_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.operators.windows import ntile_by_boundaries
    from etl_weather_jabar_spark.sources.parquet import load_table

    df = (
        load_table(spark, sf_dir, case["table"])
        .where(F.col(case["uk"]) % case["limit_mod"] == 0)
        .select(
            F.col(case["uk"]).alias("uk"),
            (F.col(case["v"]) % case["mod"]).alias("__v"),
        )
    )
    if case.get("null_res") is not None:
        df = df.withColumn(
            "__v", F.nullif(F.col("__v"), F.lit(case["null_res"]))
        )
    out = ntile_by_boundaries(df, ["__v", "uk"], case["n"], tile_col="tile")
    return sorted((r["uk"], r["tile"]) for r in out.collect())


def run_ntile_duckdb(con, case: dict):
    v = f"{case['v']} % {case['mod']}"
    if case.get("null_res") is not None:
        v = f"nullif({v}, {case['null_res']})"
    sql = (
        f"SELECT {case['uk']} AS uk, "
        f"CAST(ntile({case['n']}) OVER (ORDER BY "
        f"{v} NULLS FIRST, {case['uk']}) AS INT) AS tile "
        f"FROM {case['table']} "
        f"WHERE {case['uk']} % {case['limit_mod']} = 0"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


SCALARS = [
    # (name, spark builder, duckdb renderer) over (int col i, str col s)
    ("len_s", lambda F, i, s: F.length(F.col(s)), lambda i, s: f"length({s})"),
    ("up_s", lambda F, i, s: F.upper(F.col(s)), lambda i, s: f"upper({s})"),
    ("sub_s", lambda F, i, s: F.substring(F.col(s), 2, 3),
     lambda i, s: f"substr({s}, 2, 3)"),
    ("abs_i", lambda F, i, s: F.abs(F.col(i) - 1000),
     lambda i, s: f"abs({i} - 1000)"),
    ("mod_i", lambda F, i, s: F.col(i) % 7, lambda i, s: f"{i} % 7"),
    ("case_i", lambda F, i, s: F.when(F.col(i) % 2 == 0, F.lit("even"))
     .otherwise(F.lit("odd")),
     lambda i, s: f"CASE WHEN {i} % 2 = 0 THEN 'even' ELSE 'odd' END"),
    ("concat", lambda F, i, s: F.concat_ws(":", F.col(s), F.col(i).cast("string")),
     lambda i, s: f"concat_ws(':', {s}, CAST({i} AS VARCHAR))"),
]


def gen_scalar_case(rng: random.Random) -> dict:
    """Scalar projection + deterministic top-k: computed columns over a
    unique-keyed table, ORDER BY unique key LIMIT n — row-level compare
    of scalar-function semantics (string, arithmetic, conditional)."""
    table = rng.choice(sorted(WINDOWABLE))
    uk, part, order = WINDOWABLE[table]
    picks = rng.sample(range(len(SCALARS)), k=rng.randrange(1, 4))
    return {"kind": "scalar", "table": table, "uk": uk, "part": part,
            "order": order, "picks": picks, "n": rng.randrange(5, 60)}


def run_scalar_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    df = load_table(spark, sf_dir, case["table"])
    cols = [F.col(case["uk"]).alias("uk")]
    for p in case["picks"]:
        name, sb, _ = SCALARS[p]
        cols.append(sb(F, case["order"], case["part"]).alias(name))
    return [
        tuple(r)
        for r in df.select(*cols)
        .orderBy("uk")
        .limit(case["n"])
        .collect()
    ]


def run_scalar_duckdb(con, case: dict):
    sel = [f"{case['uk']} AS uk"]
    for p in case["picks"]:
        name, _, dr = SCALARS[p]
        sel.append(f"{dr(case['order'], case['part'])} AS {name}")
    sql = (f"SELECT {', '.join(sel)} FROM {case['table']} "
           f"ORDER BY uk LIMIT {case['n']}")
    return [tuple(r) for r in con.execute(sql).fetchall()]


def gen_setop_case(rng: random.Random) -> dict:
    """Set-operation shape: two modulus-filtered projections of one table
    combined with UNION ALL / INTERSECT / EXCEPT, then counted. INTERSECT
    and EXCEPT are DISTINCT-semantics in both engines; UNION ALL keeps
    duplicates — exactly the subtle trio worth fuzzing."""
    table = rng.choice(sorted(WINDOWABLE))
    uk, part, order = WINDOWABLE[table]
    return {
        "kind": "setop",
        "table": table,
        "cols": [part, order],
        "m1": rng.randrange(2, 9),
        "m2": rng.randrange(2, 9),
        "uk": uk,
        "op": rng.choice(["union_all", "intersect", "except"]),
    }


def run_setop_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    df = load_table(spark, sf_dir, case["table"])
    a = df.where(F.col(case["uk"]) % case["m1"] == 0).select(*case["cols"])
    b = df.where(F.col(case["uk"]) % case["m2"] == 1).select(*case["cols"])
    combined = {
        "union_all": a.unionAll(b),
        "intersect": a.intersect(b),
        "except": a.subtract(b),  # EXCEPT DISTINCT, like DuckDB
    }[case["op"]]
    out = combined.groupBy(case["cols"][0]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(case["cols"][1]).cast("bigint")).alias("s"),
    )
    return sorted(map(tuple, out.collect()))


def run_setop_duckdb(con, case: dict):
    c0, c1 = case["cols"]
    opsql = {
        "union_all": "UNION ALL",
        "intersect": "INTERSECT",
        "except": "EXCEPT",
    }[case["op"]]
    sql = f"""
    WITH u AS (
      SELECT {c0}, {c1} FROM {case['table']}
      WHERE {case['uk']} % {case['m1']} = 0
      {opsql}
      SELECT {c0}, {c1} FROM {case['table']}
      WHERE {case['uk']} % {case['m2']} = 1
    )
    SELECT {c0}, count(*) AS n, sum(CAST({c1} AS BIGINT)) AS s
    FROM u GROUP BY 1
    """
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_rollup_case(rng: random.Random) -> dict:
    """ROLLUP / CUBE grouping-set shapes over two string keys + a modulus
    filter: subtotal and grand-total rows (NULL group keys) must agree
    across engines, including how they interact with aggregates."""
    table = rng.choice(["orders", "lineitem"])
    ints, cents, strs = TABLES[table]
    return {
        "kind": "rollup",
        "table": table,
        "keys": rng.sample(strs, k=2),
        "op": rng.choice(["rollup", "cube"]),
        "icol": rng.choice(ints),
        "mod": rng.randrange(2, 9),
        "scol": rng.choice(ints),
    }


def run_rollup_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    df = load_table(spark, sf_dir, case["table"]).where(
        F.col(case["icol"]) % case["mod"] == 0
    )
    grouped = (
        df.rollup(*case["keys"])
        if case["op"] == "rollup"
        else df.cube(*case["keys"])
    )
    out = grouped.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(case["scol"]).cast("bigint")).alias("s"),
    )
    return sorted(map(tuple, out.collect()), key=str)


def run_rollup_duckdb(con, case: dict):
    k0, k1 = case["keys"]
    op = "ROLLUP" if case["op"] == "rollup" else "CUBE"
    # Documented engine divergence (found by the r3 soak, seed 1337 case
    # 157): on EMPTY input the SQL standard's () grouping set still
    # yields one grand-total row (count 0) — DuckDB does that; Spark's
    # Expand-based rollup/cube yields no rows at all. A count-0 row can
    # only be that empty-input grand total (real groups have rows), so
    # dropping n=0 rows absorbs exactly this divergence and nothing else.
    sql = f"""
    SELECT * FROM (
        SELECT {k0}, {k1}, count(*) AS n,
               sum(CAST({case['scol']} AS BIGINT)) AS s
        FROM {case['table']}
        WHERE {case['icol']} % {case['mod']} = 0
        GROUP BY {op} ({k0}, {k1})
    ) WHERE n > 0
    """
    return sorted(map(tuple, con.execute(sql).fetchall()), key=str)


def gen_datetrunc_case(rng: random.Random) -> dict:
    """Temporal shapes: a half-open timestamp-range filter + date_trunc
    bucketing (year/quarter/month/day) formatted to a string — the
    truncation boundary and range-predicate semantics must agree."""
    table, col = rng.choice(
        [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]
    )
    y = rng.randrange(1995, 1998)
    m = rng.randrange(1, 12)
    return {
        "kind": "datetrunc",
        "table": table,
        "col": col,
        "lo": f"{y}-{m:02d}-01 00:00:00",
        "hi": f"{y + (1 if m >= 10 else 0)}-{(m % 10) + 3:02d}-01 00:00:00",
        "unit": rng.choice(["year", "quarter", "month", "day"]),
    }


def run_datetrunc_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    c = F.col(case["col"])
    df = load_table(spark, sf_dir, case["table"]).where(
        (c >= F.lit(case["lo"]).cast("timestamp_ntz"))
        & (c < F.lit(case["hi"]).cast("timestamp_ntz"))
    )
    out = df.groupBy(
        F.date_format(F.date_trunc(case["unit"], c), "yyyy-MM-dd").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    return sorted(map(tuple, out.collect()))


def run_datetrunc_duckdb(con, case: dict):
    sql = f"""
    SELECT strftime(date_trunc('{case['unit']}', {case['col']}), '%Y-%m-%d')
               AS b,
           count(*) AS n
    FROM {case['table']}
    WHERE {case['col']} >= TIMESTAMP '{case['lo']}'
      AND {case['col']} <  TIMESTAMP '{case['hi']}'
    GROUP BY 1
    """
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_subquery_case(rng: random.Random) -> dict:
    """Nested/correlated subquery shapes — EXISTS / NOT EXISTS / IN /
    NOT IN / scalar comparison. Spark side runs the engine's DataFrame
    decompositions (left_semi / left_anti / broadcast 1-row agg); DuckDB
    side runs the REAL correlated subquery, so a mismatch means the
    decomposition is not semantics-preserving. NOT IN is generated only
    over a non-nullable key (c_custkey), where anti-join equivalence
    holds — the NULL-poisoned NOT IN is a different operator (and the
    registry pins it separately as a guarded anti-join)."""
    shape = rng.choice(
        ["exists", "not_exists", "in_sub", "not_in_sub", "scalar_max"]
    )
    return {
        "kind": "subquery",
        "shape": shape,
        "thr": rng.randrange(1, 6),        # correlated lineitem predicate
        "mod": rng.randrange(2, 9),         # inner-set modulus
        "res": rng.randrange(0, 2),         # inner-set residue
        "off": rng.randrange(1, 9) * 50_000,  # scalar-subquery offset cents
    }


def run_subquery_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    if case["shape"] in ("exists", "not_exists"):
        li = load_table(spark, sf_dir, "lineitem").where(
            F.col("l_linenumber") >= case["thr"]
        )
        how = "left_semi" if case["shape"] == "exists" else "left_anti"
        out = o.join(li, o["o_orderkey"] == li["l_orderkey"], how)
    elif case["shape"] in ("in_sub", "not_in_sub"):
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_nationkey") % case["mod"] == case["res"]
        )
        how = "left_semi" if case["shape"] == "in_sub" else "left_anti"
        out = o.join(c, o["o_custkey"] == c["c_custkey"], how)
    else:  # scalar_max: compare each order against an aggregate of all
        mx = o.agg(F.max(cents).alias("__mx"))
        out = o.crossJoin(F.broadcast(mx)).where(
            cents > F.col("__mx") - case["off"]
        )
    agg = out.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("s"),
    )
    return sorted(map(tuple, agg.collect()))


def run_subquery_duckdb(con, case: dict):
    if case["shape"] in ("exists", "not_exists"):
        neg = "NOT " if case["shape"] == "not_exists" else ""
        pred = (
            f"{neg}EXISTS (SELECT 1 FROM lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey "
            f"AND l.l_linenumber >= {case['thr']})"
        )
    elif case["shape"] in ("in_sub", "not_in_sub"):
        neg = "NOT " if case["shape"] == "not_in_sub" else ""
        pred = (
            f"o.o_custkey {neg}IN (SELECT c_custkey FROM customer "
            f"WHERE c_nationkey % {case['mod']} = {case['res']})"
        )
    else:
        pred = (
            "CAST(round(o.o_totalprice * 100) AS BIGINT) > "
            "(SELECT max(CAST(round(o_totalprice * 100) AS BIGINT)) "
            f"FROM orders) - {case['off']}"
        )
    sql = (
        "SELECT o_orderstatus, count(*) AS n, "
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s "
        f"FROM orders o WHERE {pred} GROUP BY 1"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_multijoin_case(rng: random.Random) -> dict:
    """Three-way join chain lineitem→orders→customer with fuzzed join
    types (inner/left at each hop), a modulus filter on the fact table,
    and grouped aggregates pulling columns from ALL THREE tables — the
    join-reordering / null-propagation surface two-table cases miss."""
    keys = rng.sample(
        ["l_returnflag", "o_orderstatus", "c_mktsegment"],
        k=rng.randrange(1, 3),
    )
    return {
        "kind": "multijoin",
        "how1": rng.choice(["inner", "left"]),
        "how2": rng.choice(["inner", "left"]),
        "mod": rng.randrange(2, 11),
        "keys": keys,
        "countd": rng.choice(["o_orderkey", "c_custkey", "l_suppkey"]),
    }


def run_multijoin_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_suppkey") % case["mod"] == 0
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"], case["how1"]).join(
        c, F.col("o_custkey") == c["c_custkey"], case["how2"]
    )
    out = j.groupBy(*case["keys"]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "s"
        ),
        F.count_distinct(F.col(case["countd"])).alias("d"),
    )
    return sorted(map(tuple, out.collect()))


def run_multijoin_duckdb(con, case: dict):
    j1 = "JOIN" if case["how1"] == "inner" else "LEFT JOIN"
    j2 = "JOIN" if case["how2"] == "inner" else "LEFT JOIN"
    keys = ", ".join(case["keys"])
    sql = f"""
    SELECT {keys}, count(*) AS n,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s,
           count(DISTINCT {case['countd']}) AS d
    FROM lineitem {j1} orders ON l_orderkey = o_orderkey
                  {j2} customer ON o_custkey = c_custkey
    WHERE l_suppkey % {case['mod']} = 0
    GROUP BY {keys}
    """
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_jointype_case(rng: random.Random) -> dict:
    """Semi / anti / full-outer join shapes over orders↔customer with a
    modulus filter on the right side — the null-matching and
    existence-semantics surface (inner/left hops don't cover it)."""
    return {
        "kind": "jointype",
        "how": rng.choice(["semi", "anti", "full"]),
        "mod": rng.randrange(2, 9),
        "key": rng.choice(["o_orderstatus", "o_orderpriority"]),
    }


def run_jointype_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % case["mod"] == 0
    )
    if case["how"] in ("semi", "anti"):
        j = o.join(
            c,
            o["o_custkey"] == c["c_custkey"],
            "left_semi" if case["how"] == "semi" else "left_anti",
        )
        out = j.groupBy(case["key"]).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mx"),
        )
    else:
        j = o.join(c, o["o_custkey"] == c["c_custkey"], "full")
        out = j.groupBy(
            F.coalesce(F.col(case["key"]), F.lit("∅")).alias("k")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.count("o_orderkey").alias("no"),
            F.count("c_custkey").alias("nc"),
        )
    return sorted(map(tuple, out.collect()))


def run_jointype_duckdb(con, case: dict):
    k = case["key"]
    if case["how"] in ("semi", "anti"):
        neg = "NOT " if case["how"] == "anti" else ""
        sql = f"""
        SELECT {k}, count(*) AS n, min(o_orderkey) AS mn,
               max(o_orderkey) AS mx
        FROM orders o
        WHERE {neg}EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey % {case['mod']} = 0
                             AND c.c_custkey = o.o_custkey)
        GROUP BY {k}
        """
    else:
        sql = f"""
        SELECT coalesce({k}, '∅') AS k, count(*) AS n,
               count(o_orderkey) AS no, count(c_custkey) AS nc
        FROM orders o FULL JOIN
             (SELECT * FROM customer WHERE c_custkey % {case['mod']} = 0) c
          ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_multidistinct_case(rng: random.Random) -> dict:
    """Several COUNT(DISTINCT ...) over different columns in ONE
    aggregate (plus a plain sum) — Catalyst plans this via Expand
    (row multiplication per distinct group), a rewrite no single-distinct
    case exercises."""
    table = rng.choice(sorted(TABLES))
    ints, cents, strs = TABLES[table]
    picks = rng.sample(ints, k=min(len(ints), rng.randrange(2, 4)))
    return {
        "kind": "multidistinct",
        "table": table,
        "distincts": picks,
        "sum_int": rng.choice(ints),
        "key": rng.choice(strs) if rng.random() < 0.6 else None,
        "mod": rng.randrange(2, 9),
    }


def run_multidistinct_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    ints = TABLES[case["table"]][0]
    df = load_table(spark, sf_dir, case["table"]).where(
        F.col(ints[0]) % case["mod"] == 0
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.count_distinct(F.col(c)).alias(f"d{i}")
        for i, c in enumerate(case["distincts"])
    ] + [F.sum(F.col(case["sum_int"])).cast("bigint").alias("s")]
    out = (
        df.groupBy(case["key"]).agg(*aggs)
        if case["key"]
        else df.agg(*aggs)
    )
    return sorted(map(tuple, out.collect()))


def run_multidistinct_duckdb(con, case: dict):
    ints = TABLES[case["table"]][0]
    ds = ", ".join(
        f"count(DISTINCT {c}) AS d{i}"
        for i, c in enumerate(case["distincts"])
    )
    key = f"{case['key']}, " if case["key"] else ""
    group = f"GROUP BY {case['key']}" if case["key"] else ""
    sql = f"""
    SELECT {key}count(*) AS n, {ds},
           CAST(sum({case['sum_int']}) AS BIGINT) AS s
    FROM {case['table']} WHERE {ints[0]} % {case['mod']} = 0 {group}
    """
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_qualify_case(rng: random.Random) -> dict:
    """Top-k-per-group: row_number over a TOTAL order, filtered ≤ k —
    the QUALIFY shape (Spark plans filter-above-window; DuckDB runs the
    subquery form). k and the direction are fuzzed."""
    table = rng.choice(sorted(WINDOWABLE))
    uk, part, order = WINDOWABLE[table]
    return {
        "kind": "qualify",
        "table": table,
        "uk": uk,
        "part": part,
        "order": order,
        "k": rng.randrange(1, 6),
        "desc": rng.random() < 0.5,
    }


def run_qualify_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from etl_weather_jabar_spark.sources.parquet import load_table

    df = load_table(spark, sf_dir, case["table"])
    ordc = (
        F.col(case["order"]).desc()
        if case["desc"]
        else F.col(case["order"]).asc()
    )
    ukc = (
        F.col(case["uk"]).desc() if case["desc"] else F.col(case["uk"]).asc()
    )
    w = W.partitionBy(case["part"]).orderBy(ordc, ukc)
    out = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= case["k"])
        .select(case["part"], F.col(case["uk"]).alias("uk"), "rn")
    )
    return sorted(map(tuple, out.collect()))


def run_qualify_duckdb(con, case: dict):
    d = "DESC" if case["desc"] else "ASC"
    sql = f"""
    SELECT {case['part']}, {case['uk']} AS uk, rn FROM (
        SELECT {case['part']}, {case['uk']},
               CAST(row_number() OVER (PARTITION BY {case['part']}
                   ORDER BY {case['order']} {d}, {case['uk']} {d}) AS INT)
                   AS rn
        FROM {case['table']}
    ) WHERE rn <= {case['k']}
    """
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_selectsub_case(rng: random.Random) -> dict:
    """Correlated scalar subquery in the SELECT list (Catalyst rewrites
    it to a left-outer aggregate join): per-customer order count / sum /
    max with a fuzzed inner filter; customers with no matching orders
    must yield the subquery's NULL (or COALESCE'd 0) — the decorrelation
    edge the WHERE-clause family never hits."""
    return {
        "kind": "selectsub",
        "agg": rng.choice(["count", "sum", "max"]),
        "mod": rng.randrange(2, 9),
        "coalesce": rng.random() < 0.5,
        "limit_mod": rng.randrange(2, 6),
    }


def run_selectsub_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % case["limit_mod"] == 0
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % case["mod"] == 0
    )
    # engine form: the decorrelated left-outer aggregate join Catalyst
    # would produce, written directly (group the inner, left join back)
    if case["agg"] == "count":
        inner = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("__v"))
        missing = F.lit(0)  # COUNT over an empty correlated set is 0
    elif case["agg"] == "sum":
        inner = o.groupBy("o_custkey").agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "__v"
            )
        )
        missing = F.lit(None).cast("bigint")
    else:
        inner = o.groupBy("o_custkey").agg(F.max("o_orderkey").alias("__v"))
        missing = F.lit(None).cast("bigint")
    j = c.join(inner, c["c_custkey"] == inner["o_custkey"], "left")
    v = F.coalesce(F.col("__v"), missing.cast("bigint"))
    if case["coalesce"]:
        v = F.coalesce(v, F.lit(-1))
    return sorted(
        map(tuple, j.select(F.col("c_custkey").alias("k"), v.alias("v")).collect()),
        key=str,
    )


def run_selectsub_duckdb(con, case: dict):
    inner = {
        "count": "count(*)",
        "sum": "sum(CAST(round(o_totalprice * 100) AS BIGINT))",
        "max": "max(o_orderkey)",
    }[case["agg"]]
    expr = (
        f"(SELECT {inner} FROM orders o WHERE o.o_orderkey % {case['mod']} = 0"
        f" AND o.o_custkey = c.c_custkey)"
    )
    if case["coalesce"]:
        expr = f"coalesce({expr}, -1)"
    sql = (
        f"SELECT c_custkey AS k, CAST({expr} AS BIGINT) AS v FROM customer c "
        f"WHERE c_custkey % {case['limit_mod']} = 0"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()), key=str)



def gen_filteragg_case(rng: random.Random) -> dict:
    """Aggregates with per-aggregate predicates: DuckDB runs the
    SQL-standard FILTER (WHERE ...) clause, Spark the conditional-
    aggregate equivalent (agg over CASE WHEN with no ELSE — NULLs are
    ignored by count/sum/min/max exactly as FILTER skips rows). The
    family pins that equivalence, including the empty-match edges
    (count -> 0, sum/min/max -> NULL) the unconditional families
    never produce."""
    table = rng.choice(sorted(TABLES))
    ints, cents, strs = TABLES[table]
    aggs = []
    for _ in range(rng.randrange(2, 4)):
        kind = rng.choice(["count", "sum_int", "min", "max"])
        col = rng.choice(ints)
        pred_col = rng.choice(ints)
        if rng.random() < 0.5:
            pred = ("mod", pred_col, rng.randrange(2, 9),
                    rng.randrange(0, 3))
        else:
            # a high threshold makes empty-match groups likely
            pred = ("gt", pred_col, rng.randrange(1, 8000))
        aggs.append((kind, col, pred))
    return {
        "kind": "filteragg",
        "table": table,
        "key": rng.choice(strs) if rng.random() < 0.7 else None,
        "mod": rng.randrange(2, 7),
        "aggs": aggs,
    }


def _filteragg_pred_spark(pred):
    from pyspark.sql import functions as F

    if pred[0] == "mod":
        _, c, m, r = pred
        return F.col(c) % m == r
    _, c, t = pred
    return F.col(c) > t


def _filteragg_pred_sql(pred):
    if pred[0] == "mod":
        _, c, m, r = pred
        return f"{c} % {m} = {r}"
    _, c, t = pred
    return f"{c} > {t}"


def run_filteragg_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    ints = TABLES[case["table"]][0]
    df = load_table(spark, sf_dir, case["table"]).where(
        F.col(ints[0]) % case["mod"] == 0
    )
    exprs = [F.count(F.lit(1)).alias("n")]
    for i, (kind, col, pred) in enumerate(case["aggs"]):
        guarded = F.when(_filteragg_pred_spark(pred), F.col(col))
        if kind == "count":
            e = F.count(guarded)
        elif kind == "sum_int":
            e = F.sum(guarded).cast("bigint")
        elif kind == "min":
            e = F.min(guarded)
        else:
            e = F.max(guarded)
        exprs.append(e.alias(f"a{i}"))
    out = (
        df.groupBy(case["key"]).agg(*exprs)
        if case["key"]
        else df.agg(*exprs)
    )
    return sorted(map(tuple, out.collect()))


def run_filteragg_duckdb(con, case: dict):
    ints = TABLES[case["table"]][0]
    parts = []
    for i, (kind, col, pred) in enumerate(case["aggs"]):
        fn = {"count": "count", "sum_int": "sum", "min": "min", "max": "max"}[
            kind
        ]
        cast = "CAST(" if kind == "sum_int" else ""
        endcast = " AS BIGINT)" if kind == "sum_int" else ""
        parts.append(
            f"{cast}{fn}({col}) FILTER (WHERE "
            f"{_filteragg_pred_sql(pred)}){endcast} AS a{i}"
        )
    key = f"{case['key']}, " if case["key"] else ""
    group = f"GROUP BY {case['key']}" if case["key"] else ""
    sql = f"""
    SELECT {key}count(*) AS n, {', '.join(parts)}
    FROM {case['table']} WHERE {ints[0]} % {case['mod']} = 0 {group}
    """
    return sorted(map(tuple, con.execute(sql).fetchall()))


def gen_bm25_case(rng: random.Random) -> dict:
    """Family 15 (round 6): the exact-integer BM25 scorer under random
    parameters — k1/b across their real ranges (b=0 disables length
    norm, b=1000 is full), random corpus slices, random query-term
    counts and length floors. Both engines run the identical rescaled
    integer arithmetic (milli idf, pre-rounded avgdl), so any mismatch
    is an engine-parity bug in decimal//HUGEINT division or ordering."""
    return {
        "kind": "bm25",
        "k1m": rng.randrange(800, 2001),
        "bm": rng.choice([0, 250, 500, 750, 1000, rng.randrange(0, 1001)]),
        "m": rng.randrange(1, 6),
        "r": 0,
        "L": rng.randrange(4, 7),
        "n": rng.randrange(1, 9),
    }


def run_bm25_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import bm25_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") % case["m"] == case["r"]
    ).select("doc_id", "text")
    tokc = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= case["L"])
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    qterms = (
        tokc.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(case["n"])
        .select(F.substring(F.md5("tok"), 1, 16).alias("th"))
    )
    out = bm25_scores(
        docs, qterms, k1_milli=case["k1m"], b_milli=case["bm"]
    )
    return sorted(map(tuple, out.collect()))


def gen_bm25_lifecycle_case(rng: random.Random) -> dict:
    """Family 16 — the PERSISTED index lifecycle (round 7): the corpus
    lands as 1–3 segments (appends deliberately replay part of an
    earlier segment to exercise the Bloom-gated overlap anti-join), a
    random slice may be tombstone-deleted, the index may then be
    compacted (deletes applied physically, sources retired atomically),
    and the serve may run the MaxScore prune. Whatever the path, the
    served ranking must equal DuckDB's inline BM25 over the SURVIVING
    documents — one twin certifies append/delete/compact/prune
    composition under random parameters."""
    dm = rng.choice([None, None, 5, 7, 9, 11, 13])
    return {
        "kind": "bm25_lifecycle",
        "k1m": rng.randrange(800, 2001),
        "bm": rng.choice([0, 250, 750, rng.randrange(0, 1001)]),
        "m": rng.randrange(1, 4),
        "L": rng.randrange(4, 7),
        "n": rng.randrange(2, 9),
        "segs": rng.randrange(1, 4),
        "del_m": dm,
        "compact": rng.random() < 0.5,
        "prune_k": rng.choice([None, 5, 10, 20]),
    }


def run_bm25_lifecycle_spark(spark, sf_dir: str, case: dict):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import (
        append_to_search_index,
        bm25_topk_indexed,
        compact_search_index,
        delete_from_search_index,
        save_search_index,
        vacuum_search_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") % case["m"] == 0
    ).select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="fuzz_sidx_")
    idx = f"{tmp}/idx"
    try:
        ns = case["segs"]
        part = F.pmod(F.col("doc_id"), F.lit(ns))
        save_search_index(docs.where(part == 0), idx)
        for i in range(1, ns):
            # each append replays a slice of segment 0 (overlap no-ops)
            batch = docs.where(
                (part == i) | ((part == 0) & (F.col("doc_id") < 40 * i))
            )
            append_to_search_index(batch, idx)
        if case["del_m"] is not None:
            delete_from_search_index(
                docs.where(
                    F.pmod(F.col("doc_id"), F.lit(case["del_m"])) == 0
                ).select("doc_id"),
                idx,
            )
        if case["compact"]:
            compact_search_index(spark, idx)
            vacuum_search_index(spark, idx)
        surv = docs
        if case["del_m"] is not None:
            surv = docs.where(
                F.pmod(F.col("doc_id"), F.lit(case["del_m"])) != 0
            )
        tokc = (
            surv.select(F.explode(F.split("text", " ")).alias("tok"))
            .where(F.length("tok") >= case["L"])
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        qterms = (
            tokc.orderBy(F.col("c").desc(), F.col("tok").asc())
            .limit(case["n"])
            .select(F.substring(F.md5("tok"), 1, 16).alias("th"))
        )
        out = bm25_topk_indexed(
            spark, idx, qterms,
            k1_milli=case["k1m"], b_milli=case["bm"],
            prune_k=case["prune_k"],
        )
        if case["prune_k"] is not None:
            out = out.orderBy(
                F.col("score_u").desc(), F.col("doc_id").asc()
            ).limit(case["prune_k"])
        return sorted(map(tuple, out.collect()))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_bm25_lifecycle_duckdb(con, case: dict):
    k1m, bm = case["k1m"], case["bm"]
    not_deleted = (
        f"AND doc_id % {case['del_m']} <> 0"
        if case["del_m"] is not None
        else ""
    )
    limit = (
        f"ORDER BY score_u DESC, doc_id ASC LIMIT {case['prune_k']}"
        if case["prune_k"] is not None
        else ""
    )
    q = f"""
    WITH src AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % {case['m']} = 0 {not_deleted}
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM src
    ),
    qterms AS (
        SELECT substr(md5(tok), 1, 16) AS th FROM (
            SELECT tok, count(*) AS c FROM tok
            WHERE length(tok) >= {case['L']}
            GROUP BY 1 ORDER BY c DESC, tok ASC LIMIT {case['n']})
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tot AS (
        SELECT CAST(count(*) AS HUGEINT) AS D,
               CAST(1000 * sum(dl) AS HUGEINT) // count(*) AS adm
        FROM dl
    ),
    tf AS (
        SELECT t.doc_id, q.th, CAST(count(*) AS BIGINT) AS tf
        FROM tok t JOIN qterms q ON substr(md5(t.tok), 1, 16) = q.th
        GROUP BY 1, 2
    ),
    dfq AS (SELECT th, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
    SELECT tf.doc_id,
           CAST(sum(
               ((D - df + 1) * 1000 // (df + 1))
               * CAST(tf AS HUGEINT) * {k1m + 1000} * 1000000
               // (CAST(tf AS HUGEINT) * 1000000
                   + {k1m} * ({1000 - bm}
                              + ({bm} * 1000 * CAST(dl AS HUGEINT)) // adm))
           ) AS BIGINT) AS score_u
    FROM tf JOIN dfq USING (th) JOIN dl USING (doc_id), tot
    GROUP BY 1
    {limit}
    """
    return sorted(map(tuple, con.execute(q).fetchall()))


def gen_vector_lifecycle_case(rng: random.Random) -> dict:
    """Family 17 — the PERSISTED VECTOR index lifecycle (round 7): a
    random corpus slice trains the residual-IVFPQ model on a random
    sub-split, the held-out split may arrive later as appends (encoded
    under the stored model, optionally in two overlapping batches to
    exercise the already-indexed id anti-join), a random slice may be
    tombstoned, the index may be compacted+vacuumed, and the serve runs
    with random k / n_probe / query count. Whatever the path, the served
    ADC ranking must equal DuckDB's replay of the asymmetric model over
    the surviving vectors — one parameterized twin
    (queries.py::_ivfpq_res_ctes) certifies the whole composition."""
    s = rng.choice([3, 4, 5])
    m = rng.randrange(1, 4)
    r = rng.randrange(s)
    if s == m and r == 0:
        # degenerate: corpus ids are the multiples of m, all ≡ 0 (mod s)
        # ⇒ the training split would be EMPTY (caught by soak seed
        # 77777 — the engine now raises a clean ValueError for it; the
        # fuzz family exercises lifecycles, not empty-corpus rejection)
        r = 1
    return {
        "kind": "vector_lifecycle",
        "m": m,
        "s": s,
        "r": r,
        "append": rng.random() < 0.8,
        "two_batches": rng.random() < 0.5,
        "del_m": rng.choice([None, None, 7, 9, 11]),
        "compact": rng.random() < 0.5,
        "k": rng.choice([5, 10, 15]),
        "p": rng.randrange(2, 5),
        "nq": rng.randrange(3, 7),
    }


def run_vector_lifecycle_spark(spark, sf_dir: str, case: dict):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.similarity import (
        append_to_vector_index,
        compact_vector_index,
        delete_from_vector_index,
        ivfpq_residual_topk_indexed,
        save_ivfpq_residual_index,
        train_ivf_centroids_exact,
        vacuum_vector_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") % case["m"] == 0
    )
    base = emb.where(F.col("vec_id") % case["s"] != case["r"])
    rest = emb.where(F.col("vec_id") % case["s"] == case["r"])
    tmp = tempfile.mkdtemp(prefix="fuzz_vidx_")
    idx = f"{tmp}/idx"
    try:
        cents = train_ivf_centroids_exact(base, n_clusters=16, iters=0)
        save_ivfpq_residual_index(base, idx, cents)
        if case["append"]:
            if case["two_batches"]:
                # first batch is a strict subset; the full batch then
                # overlaps it (already-indexed ids must anti-join away)
                append_to_vector_index(
                    rest.where(F.col("vec_id") % 2 == 0), idx
                )
            append_to_vector_index(rest, idx)
        if case["del_m"] is not None:
            delete_from_vector_index(
                emb.where(F.col("vec_id") % case["del_m"] == 0).select(
                    "vec_id"
                ),
                idx,
            )
        if case["compact"]:
            compact_vector_index(spark, idx)
            vacuum_vector_index(spark, idx)
        # twin's query set comes from its corpus CTE: slice-wide when
        # the held-out split was appended, base-only when it never
        # arrived (the twin's corpus == training corpus then)
        qsrc = emb if case["append"] else base
        queries = qsrc.where(F.col("vec_id") < case["nq"]).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = ivfpq_residual_topk_indexed(
            spark, idx, queries, k=case["k"], n_probe=case["p"]
        )
        return sorted(map(tuple, out.collect()))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_vector_lifecycle_duckdb(con, case: dict):
    from etl_weather_jabar_spark.queries import _ivfpq_res_ctes

    m, s, r = case["m"], case["s"], case["r"]
    if case["append"]:
        cp = f"({{v}} % {m} = 0)"
        tp = f"({{v}} % {s} <> {r})"
    else:
        # held-out split never arrived: corpus == training corpus
        cp = f"({{v}} % {m} = 0 AND {{v}} % {s} <> {r})"
        tp = "TRUE"
    ctes = _ivfpq_res_ctes(tp, cp, n_probe=case["p"], n_queries=case["nq"])
    del_f = (
        f"WHERE vec_id % {case['del_m']} <> 0"
        if case["del_m"] is not None
        else ""
    )
    q = f"""
    WITH {ctes}
    SELECT query_id, vec_id, adc_dist, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC
        ) AS INT) AS rank
        FROM sc {del_f}
    ) WHERE rank <= {case['k']}
    """
    return sorted(map(tuple, con.execute(q).fetchall()))


def gen_tokenlm_case(rng: random.Random) -> dict:
    """Family 18 — tokenizer/LM differentials on a SYNTHETIC corpus
    (hash-derived words, never affine — see the module gotcha): either
    a WordPiece segmentation (random vocab size, optionally dropping
    the k lexicographically-largest single-char pieces so the [UNK]
    all-or-nothing retraction actually fires) compared PER WORD against
    the recursive-CTE replay, or a stupid-backoff trigram scoring with
    a random train/eval split modulus compared per document."""
    import hashlib

    seed = rng.randrange(1 << 30)
    docs = []
    for d in range(rng.randrange(8, 30)):
        lh = hashlib.md5(f"{seed}:{d}:len".encode()).hexdigest()
        n_words = 3 + int(lh[:2], 16) % 10
        words = []
        for p in range(n_words):
            h = hashlib.md5(f"{seed}:{d}:{p}".encode()).hexdigest()
            wl = 1 + int(h[:2], 16) % 9
            words.append(h[2 : 2 + wl])
        docs.append((d, " ".join(words), f"s{d % 3}"))
    sub = rng.choice(["wordpiece", "backoff", "unigram", "kn"])
    case = {"kind": "tokenlm", "sub": sub, "docs": docs}
    if sub == "wordpiece":
        case["top_k"] = rng.randrange(2, 30)
        case["drop"] = rng.randrange(0, 3)
    elif sub == "unigram":
        # full Viterbi-EM chain: random seed width and prune target
        case["seed_k"] = rng.randrange(2, 24)
        case["keep_k"] = rng.randrange(1, 12)
    else:  # backoff / kn share the random train-split modulus
        case["mod"] = rng.randrange(2, 5)
    return case


def run_tokenlm_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        case["docs"], ["doc_id", "text", "source"]
    )
    if case["sub"] == "wordpiece":
        from etl_weather_jabar_spark.ext.tokenize import (
            UNK,
            substring_vocab,
            word_counts,
            wordpiece_encode,
        )

        wc = word_counts(docs)
        vocab = substring_vocab(wc, max_len=3, top_k=case["top_k"])
        if case["drop"]:
            singles = vocab.where(F.col("plen") == 1)
            singles = (
                singles.withColumn(
                    "rn",
                    F.row_number().over(W.orderBy(F.col("piece").desc())),
                )
                .where(F.col("rn") > case["drop"])
                .drop("rn")
            )
            vocab = singles.unionByName(vocab.where(F.col("plen") > 1))
        em = wordpiece_encode(wc, vocab)
        out = em.groupBy("w").agg(
            F.count(F.lit(1)).alias("np"),
            F.max((F.col("piece") == UNK).cast("int")).alias("unk"),
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_list(F.struct("i", "dp"))
                ).getField("dp"),
            ).alias("ps"),
        )
        return sorted(
            (r["w"], int(r["np"]), int(r["unk"]), r["ps"])
            for r in out.collect()
        )
    if case["sub"] == "unigram":
        from etl_weather_jabar_spark.ext.tokenize import (
            unigram_pieces,
            unigram_train_scores,
            unigram_viterbi_encode,
            word_counts,
        )

        wc = word_counts(docs)
        scores = unigram_train_scores(
            wc, seed_top_k=case["seed_k"], keep_top_k=case["keep_k"]
        )
        em = unigram_pieces(unigram_viterbi_encode(wc, scores))
        out = em.groupBy("w").agg(
            F.count(F.lit(1)).alias("np"),
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_list(F.struct("i", "piece"))
                ).getField("piece"),
            ).alias("ps"),
        )
        return sorted(
            (r["w"], int(r["np"]), r["ps"]) for r in out.collect()
        )
    if case["sub"] == "kn":
        from etl_weather_jabar_spark.ext.lm import kneser_ney_score

        train = docs.where(F.col("doc_id") % case["mod"] == 0)
        ev = docs.where(F.col("doc_id") % case["mod"] != 0)
        return sorted(
            map(tuple, kneser_ney_score(train, ev).collect())
        )
    from etl_weather_jabar_spark.ext.lm import trigram_backoff_score

    train = docs.where(F.col("doc_id") % case["mod"] == 0)
    ev = docs.where(F.col("doc_id") % case["mod"] != 0)
    return sorted(
        map(tuple, trigram_backoff_score(train, ev).collect())
    )


def run_tokenlm_duckdb(con, case: dict):
    import pandas as pd

    pdf = pd.DataFrame(case["docs"], columns=["doc_id", "text", "source"])
    con.register("fuzzdocs", pdf)
    halfup = (
        lambda num, den: f"(((2*({num}) + ({den})) - ((((2*({num}) + ({den}))) "
        f"% ((2*({den}))) + ((2*({den})))) % ((2*({den}))))) // ((2*({den}))))"
    )
    if case["sub"] == "wordpiece":
        sql = f"""
        WITH RECURSIVE wordtab AS (
            SELECT w, CAST(count(*) AS BIGINT) AS f
            FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                            x -> x <> '')) AS w
                  FROM fuzzdocs)
            GROUP BY 1
        ),
        pos1 AS (SELECT w, f, unnest(range(1, length(w) + 1)) AS p
                 FROM wordtab),
        lens AS (SELECT w, f, p, unnest([1, 2, 3]) AS l FROM pos1),
        subs AS (SELECT substr(w, CAST(p AS INTEGER), CAST(l AS INTEGER))
                            AS piece,
                        CAST(l AS BIGINT) AS plen,
                        CAST(sum(f) AS BIGINT) AS c
                 FROM lens WHERE p + l - 1 <= length(w) GROUP BY 1, 2),
        v1 AS (SELECT piece, plen FROM subs WHERE plen = 1),
        v1k AS (SELECT piece, plen FROM
                    (SELECT piece, plen,
                            row_number() OVER (ORDER BY piece DESC) AS rn
                     FROM v1)
                WHERE rn > {case["drop"]}),
        vtop AS (SELECT piece, plen FROM subs WHERE plen > 1
                 ORDER BY c DESC, piece ASC LIMIT {case["top_k"]}),
        vocab AS (SELECT * FROM v1k UNION ALL SELECT * FROM vtop),
        step(w, rem, i, piece) AS (
            SELECT w, w AS rem, CAST(-1 AS BIGINT), CAST(NULL AS VARCHAR)
            FROM wordtab
            UNION ALL
            SELECT s.w,
                   CASE WHEN coalesce(v3.piece, v2.piece, v1.piece) IS NULL
                        THEN ''
                        ELSE substr(s.rem,
                            length(coalesce(v3.piece, v2.piece,
                                            v1.piece)) + 1)
                   END,
                   s.i + 1,
                   coalesce(v3.piece, v2.piece, v1.piece, '[UNK]')
            FROM step s
            LEFT JOIN vocab v3
                ON v3.plen = 3 AND v3.piece = substr(s.rem, 1, 3)
            LEFT JOIN vocab v2
                ON v2.plen = 2 AND v2.piece = substr(s.rem, 1, 2)
            LEFT JOIN vocab v1
                ON v1.plen = 1 AND v1.piece = substr(s.rem, 1, 1)
            WHERE s.rem <> ''
        ),
        em0 AS (SELECT w, i, piece,
                       CASE WHEN i = 0 THEN piece
                            ELSE '##' || piece END AS dp
                FROM step WHERE i >= 0),
        unkw AS (SELECT DISTINCT w FROM em0 WHERE piece = '[UNK]'),
        em AS (SELECT * FROM em0 WHERE w NOT IN (SELECT w FROM unkw)
               UNION ALL
               SELECT w, CAST(0 AS BIGINT), '[UNK]', '[UNK]' FROM unkw)
        SELECT w, CAST(count(*) AS BIGINT) AS np,
               max(CASE WHEN piece = '[UNK]' THEN 1 ELSE 0 END) AS unk,
               string_agg(dp, '|' ORDER BY i) AS ps
        FROM em GROUP BY w
        """
    elif case["sub"] == "unigram":
        from etl_weather_jabar_spark.queries import (
            _unigram_dp_sql,
            _unigram_pieces_sql,
        )

        sql = f"""
        WITH RECURSIVE wordtab AS (
            SELECT w, CAST(count(*) AS BIGINT) AS f
            FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                            x -> x <> '')) AS w
                  FROM fuzzdocs)
            GROUP BY 1
        ),
        pos1 AS (SELECT w, f, unnest(range(1, length(w) + 1)) AS p
                 FROM wordtab),
        lens0 AS (SELECT w, f, p, unnest([1, 2, 3]) AS l FROM pos1),
        subs AS (SELECT substr(w, CAST(p AS INTEGER), CAST(l AS INTEGER))
                            AS piece,
                        CAST(l AS BIGINT) AS plen,
                        CAST(sum(f) AS BIGINT) AS score
                 FROM lens0 WHERE p + l - 1 <= length(w) GROUP BY 1, 2),
        svtop AS (SELECT piece, plen, score FROM subs WHERE plen > 1
                  ORDER BY score DESC, piece ASC LIMIT {case["seed_k"]}),
        seedvocab AS (SELECT piece, plen, score FROM subs WHERE plen = 1
                      UNION ALL SELECT piece, plen, score FROM svtop),
        {_unigram_dp_sql('seedvocab', 'dp0')},
        {_unigram_pieces_sql('dp0', 'p0')},
        usage AS (SELECT piece, CAST(sum(f) AS BIGINT) AS u
                  FROM p0 JOIN wordtab USING (w) GROUP BY 1),
        tvtop AS (SELECT s.piece, s.plen, u.u AS score
                  FROM seedvocab s JOIN usage u USING (piece)
                  WHERE s.plen > 1 AND u.u > 0
                  ORDER BY u.u DESC, s.piece ASC LIMIT {case["keep_k"]}),
        tvocab AS (SELECT s.piece, s.plen,
                          CAST(coalesce(u.u, 0) AS BIGINT) AS score
                   FROM seedvocab s LEFT JOIN usage u USING (piece)
                   WHERE s.plen = 1
                   UNION ALL SELECT piece, plen, score FROM tvtop),
        {_unigram_dp_sql('tvocab', 'dp1')},
        {_unigram_pieces_sql('dp1', 'p1')},
        em AS (SELECT w, i, piece FROM p1
               UNION ALL
               SELECT w, CAST(0 AS BIGINT), '[UNK]'
               FROM dp1 WHERE lens IS NULL)
        SELECT w, CAST(count(*) AS BIGINT) AS np,
               string_agg(piece, '|' ORDER BY i) AS ps
        FROM em GROUP BY w
        """
    elif case["sub"] == "kn":
        mod = case["mod"]
        sql = f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(generate_subscripts(ss, 1) AS BIGINT) AS pos,
                   unnest(ss) AS tok
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '),
                                     x -> x <> '') AS ss
                  FROM fuzzdocs)
        ),
        seqs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {mod} = 0 THEN 0 ELSE 1 END AS half,
                   tok AS w1,
                   lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS w2
            FROM toks
        ),
        big AS (
            SELECT doc_id, half,
                   substr(md5(w1 || ' ' || w2), 1, 16) AS h12,
                   substr(md5(w1), 1, 16) AS h1,
                   substr(md5(w2), 1, 16) AS hw
            FROM seqs WHERE w2 IS NOT NULL
        ),
        types AS (
            SELECT h12, min(h1) AS h1, min(hw) AS hw, count(*) AS c12
            FROM big WHERE half = 0 GROUP BY 1
        ),
        ctx1 AS (SELECT h1, count(*) AS c1
                 FROM big WHERE half = 0 GROUP BY 1),
        n1p AS (SELECT h1, count(*) AS n1p FROM types GROUP BY 1),
        nr AS (SELECT hw, count(*) AS nr FROM types GROUP BY 1),
        tot AS (SELECT count(*) AS t FROM types),
        scored AS (
            SELECT b.doc_id,
                   CASE WHEN (SELECT t FROM tot) = 0 THEN 0
                        WHEN c.c1 IS NOT NULL THEN CAST(
                            (greatest(
                                 CAST(coalesce(ty.c12, 0) AS HUGEINT) * 4
                                     - 3,
                                 0)
                                 * (SELECT t FROM tot)
                             + CAST(p.n1p AS HUGEINT) * 3
                                 * coalesce(r.nr, 0))
                            * 1000000
                            // (CAST(c.c1 AS HUGEINT) * 4
                                * (SELECT t FROM tot)) AS BIGINT)
                        ELSE CAST(
                            CAST(coalesce(r.nr, 0) AS HUGEINT) * 1000000
                            // (SELECT t FROM tot) AS BIGINT)
                   END AS ppm
            FROM big b
            LEFT JOIN (SELECT h12, c12 FROM types) ty USING (h12)
            LEFT JOIN ctx1 c USING (h1)
            LEFT JOIN n1p p USING (h1)
            LEFT JOIN nr r USING (hw)
            WHERE b.half = 1
        ),
        pd AS (SELECT doc_id, count(*) AS n_bigrams,
                      CAST(sum(ppm) AS BIGINT) AS sp,
                      CAST(min(ppm) AS BIGINT) AS min_ppm
               FROM scored GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST({halfup('pd.sp', 'pd.n_bigrams')} AS BIGINT)
                   AS kn_ppm,
               pd.min_ppm
        FROM (SELECT doc_id FROM fuzzdocs WHERE doc_id % {mod} <> 0) d
        LEFT JOIN pd USING (doc_id)
        """
    else:
        mod = case["mod"]
        sql = f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(generate_subscripts(ss, 1) AS BIGINT) AS pos,
                   unnest(ss) AS tok
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '),
                                     x -> x <> '') AS ss
                  FROM fuzzdocs)
        ),
        seqs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {mod} = 0 THEN 0 ELSE 1 END AS half,
                   tok AS w1,
                   lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS w2,
                   lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS w3
            FROM toks
        ),
        tri AS (
            SELECT doc_id, half,
                   substr(md5(w1 || ' ' || w2 || ' ' || w3), 1, 16) AS h3,
                   substr(md5(w1 || ' ' || w2), 1, 16) AS h12,
                   substr(md5(w2 || ' ' || w3), 1, 16) AS h23,
                   substr(md5(w3), 1, 16) AS hw
            FROM seqs WHERE w2 IS NOT NULL AND w3 IS NOT NULL
        ),
        big AS (
            SELECT substr(md5(w1 || ' ' || w2), 1, 16) AS h23,
                   substr(md5(w1), 1, 16) AS h2
            FROM seqs WHERE half = 0 AND w2 IS NOT NULL
        ),
        uni AS (
            SELECT substr(md5(w1), 1, 16) AS hw FROM seqs WHERE half = 0
        ),
        c3 AS (SELECT h3, min(h12) AS h12, count(*) AS c3
               FROM tri WHERE half = 0 GROUP BY 1),
        c12 AS (SELECT h12, count(*) AS c12
                FROM tri WHERE half = 0 GROUP BY 1),
        stats3 AS (SELECT h3, CAST(c3 * 1000000 AS BIGINT) // c12 AS ppm3
                   FROM c3 JOIN c12 USING (h12)),
        c23 AS (SELECT h23, min(h2) AS h2, count(*) AS c23
                FROM big GROUP BY 1),
        c2 AS (SELECT h2, count(*) AS c2
               FROM (SELECT hw AS h2 FROM uni) GROUP BY 1),
        stats2 AS (SELECT h23,
                          (CAST(c23 * 1000000 AS BIGINT) // c2) * 2 // 5
                              AS ppm2
                   FROM c23 JOIN c2 USING (h2)),
        stats1 AS (SELECT hw,
                          (CAST(count(*) * 1000000 AS BIGINT)
                               // (SELECT count(*) FROM uni)) * 4 // 25
                              AS ppm1
                   FROM uni GROUP BY hw),
        scored AS (
            SELECT t.doc_id,
                   CASE WHEN s3.ppm3 IS NOT NULL THEN s3.ppm3
                        WHEN s2.ppm2 IS NOT NULL THEN s2.ppm2
                        ELSE coalesce(s1.ppm1, 0) END AS ppm
            FROM tri t
            LEFT JOIN stats3 s3 USING (h3)
            LEFT JOIN stats2 s2 USING (h23)
            LEFT JOIN stats1 s1 USING (hw)
            WHERE t.half = 1
        ),
        pd AS (SELECT doc_id, count(*) AS n_trigrams,
                      CAST(sum(ppm) AS BIGINT) AS sp,
                      CAST(min(ppm) AS BIGINT) AS min_ppm
               FROM scored GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(pd.n_trigrams, 0) AS BIGINT) AS n_trigrams,
               CAST({halfup('pd.sp', 'pd.n_trigrams')} AS BIGINT)
                   AS bo_ppm,
               pd.min_ppm
        FROM (SELECT doc_id FROM fuzzdocs WHERE doc_id % {mod} <> 0) d
        LEFT JOIN pd USING (doc_id)
        """
    rows = con.execute(sql).fetchall()
    con.unregister("fuzzdocs")
    return sorted(map(tuple, rows))


def run_bm25_duckdb(con, case: dict):
    k1m, bm = case["k1m"], case["bm"]
    q = f"""
    WITH src AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % {case['m']} = {case['r']}
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM src
    ),
    qterms AS (
        SELECT substr(md5(tok), 1, 16) AS th FROM (
            SELECT tok, count(*) AS c FROM tok
            WHERE length(tok) >= {case['L']}
            GROUP BY 1 ORDER BY c DESC, tok ASC LIMIT {case['n']})
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tot AS (
        SELECT CAST(count(*) AS HUGEINT) AS D,
               CAST(1000 * sum(dl) AS HUGEINT) // count(*) AS adm
        FROM dl
    ),
    tf AS (
        SELECT t.doc_id, q.th, CAST(count(*) AS BIGINT) AS tf
        FROM tok t JOIN qterms q ON substr(md5(t.tok), 1, 16) = q.th
        GROUP BY 1, 2
    ),
    dfq AS (SELECT th, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
    SELECT tf.doc_id,
           CAST(sum(
               ((D - df + 1) * 1000 // (df + 1))
               * CAST(tf AS HUGEINT) * {k1m + 1000} * 1000000
               // (CAST(tf AS HUGEINT) * 1000000
                   + {k1m} * ({1000 - bm}
                              + ({bm} * 1000 * CAST(dl AS HUGEINT)) // adm))
           ) AS BIGINT) AS score_u
    FROM tf JOIN dfq USING (th) JOIN dl USING (doc_id), tot
    GROUP BY 1
    """
    return sorted(map(tuple, con.execute(q).fetchall()))


def gen_case(rng: random.Random) -> dict:
    """One random query AST: table (or an equi-join of two), 0-2 filters,
    0-2 group keys, 1-3 aggs."""
    join = rng.choice(JOINS) if rng.random() < 0.4 else None
    if join:
        lt, rt, lk, rk = join
        li, lc, ls = TABLES[lt]
        ri, rc, rs = TABLES[rt]
        ints, cents, strs = li + ri, lc + rc, ls + rs
        table = lt
    else:
        table = rng.choice(sorted(TABLES))
        ints, cents, strs = TABLES[table]
    filters = []
    for _ in range(rng.randrange(3)):
        r = rng.random()
        if r < 0.5:
            col = rng.choice(ints)
            filters.append(("num", col, rng.choice(CMP_OPS), rng.randrange(1, 5000)))
        elif r < 0.7:
            col = rng.choice(strs)
            filters.append(("mod", rng.choice(ints), rng.randrange(2, 13), col))
        elif r < 0.85:
            # NULL machinery: nullif() creates real NULLs deterministically
            filters.append(
                ("nullf", rng.choice(ints), rng.randrange(2, 7),
                 rng.choice([True, False]))
            )
        else:
            # LIKE prefix/contains/suffix on a string col (case-sensitive
            # in both engines; empty matches are a valid comparison too)
            ch = rng.choice("aeimnoprst")
            pat = rng.choice([f"{ch}%", f"%{ch}%", f"%{ch}"])
            filters.append(("like", rng.choice(strs), pat))
    keys = rng.sample(strs, k=rng.randrange(0, min(2, len(strs)) + 1))
    aggs = [("count", None)]
    for _ in range(rng.randrange(3)):
        kind = rng.choice(
            ["sum_units", "min", "max", "sum_int", "countd", "count_nullable"]
        )
        if kind == "sum_units":
            aggs.append((kind, rng.choice(cents)))
        elif kind == "count_nullable":
            aggs.append((kind, (rng.choice(ints), rng.randrange(2, 7))))
        elif kind in ("min", "max", "sum_int", "countd"):
            aggs.append((kind, rng.choice(ints)))
    return {
        "table": table,
        "join": join,
        "how": rng.choice(["inner", "left"]),
        "filters": filters,
        "keys": keys,
        "aggs": aggs,
        # HAVING on the count agg (a0) when grouped; exercises post-agg
        # filters surviving both planners
        "having_min_count": (
            rng.randrange(1, 50) if keys and rng.random() < 0.4 else None
        ),
    }


def run_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sources.parquet import load_table

    df = load_table(spark, sf_dir, case["table"])
    if case.get("join"):
        lt, rt, lk, rk = case["join"]
        right = load_table(spark, sf_dir, rt)
        df = df.join(right, df[lk] == right[rk], case["how"])
    for f in case["filters"]:
        if f[0] == "num":
            _, col, op, lit = f
            expr = {
                "<": F.col(col) < lit, "<=": F.col(col) <= lit,
                ">": F.col(col) > lit, ">=": F.col(col) >= lit,
                "=": F.col(col) == lit, "<>": F.col(col) != lit,
            }[op]
            df = df.where(expr)
        elif f[0] == "mod":
            _, icol, m, scol = f
            # correlate a string col with an int residue: exercises
            # string-col survival through a numeric predicate
            df = df.where((F.col(icol) % m == 0) & F.col(scol).isNotNull())
        elif f[0] == "like":
            _, scol, pat = f
            df = df.where(F.col(scol).like(pat))
        else:
            _, icol, m, want_null = f
            e = F.nullif(F.col(icol) % m, F.lit(0))
            df = df.where(e.isNull() if want_null else e.isNotNull())
    agg_exprs = []
    for i, (kind, col) in enumerate(case["aggs"]):
        a = f"a{i}"
        if kind == "count":
            agg_exprs.append(F.count(F.lit(1)).alias(a))
        elif kind == "sum_units":
            agg_exprs.append(
                F.sum(F.round(F.col(col) * 100).cast("bigint")).alias(a)
            )
        elif kind == "sum_int":
            agg_exprs.append(F.sum(F.col(col).cast("bigint")).alias(a))
        elif kind == "countd":
            agg_exprs.append(F.count_distinct(F.col(col)).alias(a))
        elif kind == "count_nullable":
            icol, m = col
            # null-ignoring count over an expression with real NULLs
            agg_exprs.append(
                F.count(F.nullif(F.col(icol) % m, F.lit(0))).alias(a)
            )
        else:
            agg_exprs.append(getattr(F, kind)(F.col(col)).alias(a))
    out = (
        df.groupBy(*case["keys"]).agg(*agg_exprs)
        if case["keys"]
        else df.agg(*agg_exprs)
    )
    if case.get("having_min_count"):
        out = out.where(F.col("a0") >= case["having_min_count"])
    return sorted(map(tuple, out.collect()))


def render_duckdb(case: dict) -> str:
    where = []
    for f in case["filters"]:
        if f[0] == "num":
            _, col, op, lit = f
            where.append(f"{col} {op} {lit}")
        elif f[0] == "mod":
            _, icol, m, scol = f
            where.append(f"({icol} % {m} = 0 AND {scol} IS NOT NULL)")
        elif f[0] == "like":
            _, scol, pat = f
            where.append(f"{scol} LIKE '{pat}'")
        else:
            _, icol, m, want_null = f
            tail = "IS NULL" if want_null else "IS NOT NULL"
            where.append(f"nullif({icol} % {m}, 0) {tail}")
    sel, grp = [], []
    for k in case["keys"]:
        sel.append(k)
        grp.append(k)
    for i, (kind, col) in enumerate(case["aggs"]):
        a = f"a{i}"
        if kind == "count":
            sel.append(f"count(*) AS {a}")
        elif kind == "sum_units":
            sel.append(f"sum(CAST(round({col} * 100) AS BIGINT)) AS {a}")
        elif kind == "sum_int":
            sel.append(f"sum(CAST({col} AS BIGINT)) AS {a}")
        elif kind == "countd":
            sel.append(f"count(DISTINCT {col}) AS {a}")
        elif kind == "count_nullable":
            icol, m = col
            sel.append(f"count(nullif({icol} % {m}, 0)) AS {a}")
        else:
            sel.append(f"{kind}({col}) AS {a}")
    sql = f"SELECT {', '.join(sel)} FROM {case['table']}"
    if case.get("join"):
        lt, rt, lk, rk = case["join"]
        jw = "JOIN" if case["how"] == "inner" else "LEFT JOIN"
        sql += f" {jw} {rt} ON {case['table']}.{lk} = {rt}.{rk}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    if grp:
        sql += " GROUP BY " + ", ".join(grp)
        if case.get("having_min_count"):
            sql += f" HAVING count(*) >= {case['having_min_count']}"
    return sql


def run_duckdb(con, case: dict):
    rows = con.execute(render_duckdb(case)).fetchall()
    return sorted(map(tuple, rows))


def normalize(rows):
    # DuckDB returns Decimal/float128-ish for some sums; unify to python
    # ints/floats/strings for comparison
    out = []
    for r in rows:
        out.append(
            tuple(
                int(x) if isinstance(x, bool) is False and hasattr(x, "__int__")
                and not isinstance(x, float) else x
                for x in r
            )
        )
    return out


def main() -> int:
    import duckdb

    from etl_weather_jabar_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_cases = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    # optional 4th arg: force every case into ONE family by name
    # (e.g. `tokenlm`) — the validation mode each new family ships with
    only = sys.argv[4] if len(sys.argv) > 4 else None

    spark = get_spark("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    # families 15/16 (BM25) run on the documents corpus and family 17
    # (vector lifecycle) on embeddings — neither is in the
    # relational-AST TABLES dict
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )

    rng = random.Random(seed)
    failures = 0
    for i in range(n_cases):
        roll = rng.random()
        if only is not None:
            g = globals()
            case = g[f"gen_{only}_case"](rng)
            a = normalize(g[f"run_{only}_spark"](spark, sf_dir, case))
            b = normalize(g[f"run_{only}_duckdb"](con, case))
        elif roll < 0.14:
            case = gen_window_case(rng)
            a = normalize(run_window_spark(spark, sf_dir, case))
            b = normalize(run_window_duckdb(con, case))
        elif roll < 0.26:
            case = gen_scalar_case(rng)
            a = normalize(run_scalar_spark(spark, sf_dir, case))
            b = normalize(run_scalar_duckdb(con, case))
        elif roll < 0.38:
            case = gen_setop_case(rng)
            a = normalize(run_setop_spark(spark, sf_dir, case))
            b = normalize(run_setop_duckdb(con, case))
        elif roll < 0.5:
            case = gen_subquery_case(rng)
            a = normalize(run_subquery_spark(spark, sf_dir, case))
            b = normalize(run_subquery_duckdb(con, case))
        elif roll < 0.58:
            case = gen_multijoin_case(rng)
            a = normalize(run_multijoin_spark(spark, sf_dir, case))
            b = normalize(run_multijoin_duckdb(con, case))
        elif roll < 0.66:
            case = gen_rollup_case(rng)
            a = normalize(run_rollup_spark(spark, sf_dir, case))
            b = normalize(run_rollup_duckdb(con, case))
        elif roll < 0.72:
            case = gen_datetrunc_case(rng)
            a = normalize(run_datetrunc_spark(spark, sf_dir, case))
            b = normalize(run_datetrunc_duckdb(con, case))
        elif roll < 0.78:
            case = gen_jointype_case(rng)
            a = normalize(run_jointype_spark(spark, sf_dir, case))
            b = normalize(run_jointype_duckdb(con, case))
        elif roll < 0.86:
            case = gen_multidistinct_case(rng)
            a = normalize(run_multidistinct_spark(spark, sf_dir, case))
            b = normalize(run_multidistinct_duckdb(con, case))
        elif roll < 0.9:
            case = gen_qualify_case(rng)
            a = normalize(run_qualify_spark(spark, sf_dir, case))
            b = normalize(run_qualify_duckdb(con, case))
        elif roll < 0.93:
            case = gen_selectsub_case(rng)
            a = normalize(run_selectsub_spark(spark, sf_dir, case))
            b = normalize(run_selectsub_duckdb(con, case))
        elif roll < 0.95:
            case = gen_filteragg_case(rng)
            a = normalize(run_filteragg_spark(spark, sf_dir, case))
            b = normalize(run_filteragg_duckdb(con, case))
        elif roll < 0.97:
            case = gen_ntile_case(rng)
            a = normalize(run_ntile_spark(spark, sf_dir, case))
            b = normalize(run_ntile_duckdb(con, case))
        elif roll < 0.98:
            case = gen_bm25_case(rng)
            a = normalize(run_bm25_spark(spark, sf_dir, case))
            b = normalize(run_bm25_duckdb(con, case))
        elif roll < 0.99:
            case = gen_bm25_lifecycle_case(rng)
            a = normalize(run_bm25_lifecycle_spark(spark, sf_dir, case))
            b = normalize(run_bm25_lifecycle_duckdb(con, case))
        elif roll < 0.993:
            case = gen_vector_lifecycle_case(rng)
            a = normalize(run_vector_lifecycle_spark(spark, sf_dir, case))
            b = normalize(run_vector_lifecycle_duckdb(con, case))
        elif roll < 0.997:
            case = gen_tokenlm_case(rng)
            a = normalize(run_tokenlm_spark(spark, sf_dir, case))
            b = normalize(run_tokenlm_duckdb(con, case))
        else:
            case = gen_case(rng)
            a = normalize(run_spark(spark, sf_dir, case))
            b = normalize(run_duckdb(con, case))
        if a != b:
            failures += 1
            print(f"MISMATCH case {i}: {case}")
            if "kind" not in case:  # only base-family cases render as SQL
                print(f"  sql: {render_duckdb(case)}")
            print(f"  spark rows={len(a)} duckdb rows={len(b)}")
            for x, y in list(zip(a, b))[:3]:
                if x != y:
                    print(f"  {x} != {y}")
    print(f"{failures} mismatches over {n_cases} cases (seed {seed})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
