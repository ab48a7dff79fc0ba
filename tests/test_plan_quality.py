"""Mechanical plan-quality gate over the ENTIRE query registry.

tools/plan_audit.py renders the headline plans for human review; this test
makes the two unambiguous scale red-flags a hard gate for every registered
query, so a regression (a lost broadcast hint, an accidental cartesian, a
non-equi join slipping into a nested loop) fails CI instead of surfacing in
a round report:

* ``CartesianProduct`` — never acceptable (every deliberate cross join in
  the engine broadcasts a tiny side, which plans as
  BroadcastNestedLoopJoin, not CartesianProduct);
* ``BroadcastNestedLoopJoin`` — acceptable only on the documented
  whitelist (tools/plan_audit.py::EXPECTED_NESTED_LOOP), where the
  broadcast side is rows-of-stats sized by construction.

Plans are compiled at sf0.001 (query builders that sample the data —
approxQuantile bucket bounds, counts — run tiny jobs; no query executes
its full plan here).
"""

from __future__ import annotations

import pytest

from etl_weather_jabar_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_and_whitelisted_nested_loops(spark):
    from tools.plan_audit import EXPECTED_NESTED_LOOP

    cartesian, stray_bnlj, errors = [], [], []
    for name in sorted(QUERIES):
        try:
            plan = _plan(spark, name)
        except Exception as e:  # pragma: no cover - surfaced in assert
            errors.append((name, repr(e)[:200]))
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in EXPECTED_NESTED_LOOP:
            stray_bnlj.append(name)
    assert not errors, f"queries failed to plan: {errors}"
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    assert not stray_bnlj, (
        "BroadcastNestedLoopJoin outside the documented whitelist in: "
        f"{stray_bnlj} — either fix the join to an equi-join or add the "
        "query to tools/plan_audit.py::EXPECTED_NESTED_LOOP with the "
        "reason its broadcast side is stats-sized"
    )


@pytest.mark.parametrize("name", ["pricing_summary", "broadcast_dim_join"])
def test_gate_is_sensitive(spark, name):
    """The gate reads real plans (not empty strings): a known-good query
    plans clean and non-trivially."""
    plan = _plan(spark, name)
    assert "Scan parquet" in plan and len(plan) > 500
