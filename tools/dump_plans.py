"""Dump `.explain("formatted")` for named queries into plans/<tag>/ files.

    python tools/dump_plans.py <tag> <suffix> <query> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (suffix: before/after).
Runs in plan-only mode (no jobs; iterative builders produce one
representative round, exactly like tools/plan_audit.py / PLANS.md).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_weather_jabar_spark.planmode import plan_only  # noqa: E402
from etl_weather_jabar_spark.queries import QUERIES  # noqa: E402
from etl_weather_jabar_spark.session import get_spark  # noqa: E402


def formatted_plan(spark, df) -> str:
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        with plan_only():
            df = QUERIES[name](spark, sf_dir)
            plan = formatted_plan(spark, df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
