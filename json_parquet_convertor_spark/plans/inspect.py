"""Physical-plan inspection utilities.

Programmatic access to the facts that define a query's 100 TB posture:
which filters reached the scan, which columns survived pruning, what join
strategies Catalyst picked, how many shuffles the plan costs, and whether
anything quadratic (cartesian / nested-loop) slipped in. Used by
``tests/test_plans.py`` to pin plan shapes as regression tests, and
available interactively for tuning:

    from json_parquet_convertor_spark.plans.inspect import audit
    audit(df)   # -> {"exchanges": 1, "joins": ["BroadcastHashJoin"], ...}
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# physical operators that imply a quadratic or driver-bound shape
_QUADRATIC = ("CartesianProduct",)
_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit(df: DataFrame) -> dict:
    """Summarize the plan facts that matter at scale."""
    plan = physical_plan(df)
    lines = plan.splitlines()
    return {
        "exchanges": sum(
            1 for l in lines if "Exchange" in l and "Reused" not in l
        ),
        "joins": _JOIN_RE.findall(plan),
        "pushed_filters": [
            m for l in lines for m in re.findall(r"PushedFilters: \[([^\]]*)\]", l)
        ],
        "read_schemas": [
            l.split("ReadSchema:", 1)[1].strip() for l in lines if "ReadSchema:" in l
        ],
        "has_quadratic": any(q in plan for q in _QUADRATIC),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "hash_aggregates": plan.count("HashAggregate"),
        "windows": [l.strip() for l in lines if re.search(r"\bWindow \[", l)],
    }


def assert_scan_pruned(df: DataFrame, must_have: list[str], must_not: list[str]) -> None:
    """Assert column pruning reached the scan's ReadSchema."""
    schemas = audit(df)["read_schemas"]
    assert schemas, "no FileScan ReadSchema found"
    joined = " ".join(schemas)
    for col in must_have:
        assert col in joined, f"{col} missing from ReadSchema: {joined}"
    for col in must_not:
        assert col not in joined, f"{col} not pruned from ReadSchema: {joined}"
