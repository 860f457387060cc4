"""Registry-wide plan-shape gate (round-7 invariant).

Explains EVERY registered query's physical plan and fails on the three
scale-killer operator classes — CartesianProduct, BatchEvalPython
(row-at-a-time Python UDF), and BroadcastNestedLoopJoin whose build
side is not provably bounded. The round-6 link-prediction wedge
explosion (>900 s at sf1, zero human-visible plan smell) motivated
making this mechanical: per-wave plan discipline is now an invariant
that protects every future wave for free.

Boundedness proof and the documented-bounded allowlist live in
``tools/plan_gate.py`` (shared with the standalone report runner) —
each allowlist entry names the query and its boundedness argument.
"""

import pytest

import tools.plan_gate as pg

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_no_scale_killers_in_any_registered_plan(spark, registry):
    violations = {}
    bnlj_live = set()
    for name, fn in registry.items():
        try:
            plan = pg.simple_plan(fn(spark, SF))
        except Exception as exc:
            violations[name] = [f"plan build failed: {exc!r:.200}"]
            continue
        bad = pg.violations_for(name, plan)
        if bad:
            violations[name] = bad
        if name in pg.ALLOWLIST and "BroadcastNestedLoopJoin" in plan:
            bnlj_live.add(name)
    assert not violations, "\n".join(
        f"{n}: {'; '.join(b)}" for n, b in sorted(violations.items())
    )
    # the allowlist must not rot: every entry must still exempt a live
    # BroadcastNestedLoopJoin — a dead entry means the plan changed and
    # the exemption (with its boundedness argument) should be removed
    dead = set(pg.ALLOWLIST) - bnlj_live
    assert not dead, f"stale allowlist entries (no BNLJ in plan): {dead}"


def test_parser_handles_nested_build_sides():
    """Unit check of the tree parser on a hand-built plan: the outer
    BNLJ's bounded (global-agg) build side must not mask the inner
    BNLJ's unbounded one."""
    plan = """== Physical Plan ==
AdaptiveSparkPlan isFinalPlan=false
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- Project [a#1]
   :  +- BroadcastNestedLoopJoin BuildRight, Inner, (b#2 > a#1)
   :     :- FileScan parquet [a#1]
   :     +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
   :        +- FileScan parquet [b#2]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=2]
      +- HashAggregate(keys=[], functions=[count(1)])
         +- FileScan parquet [c#3]
"""
    bad = pg.violations_for("not_in_allowlist", plan)
    assert len(bad) == 1 and "unproven build side" in bad[0]
    assert "FileScan parquet [b#2" in bad[0]


def test_parser_accepts_bounded_markers():
    for marker in (
        "HashAggregate(keys=[], functions=[count(1)])",
        "LocalTableScan [x#1]",
        "Scan ExistingRDD[model#1]",
        "GlobalLimit 100",
        "TakeOrderedAndProject(limit=10, orderBy=[x#1 ASC])",
        "Range (0, 500, step=1)",
    ):
        plan = f"""== Physical Plan ==
BroadcastNestedLoopJoin BuildRight, Cross
:- FileScan parquet [a#1]
+- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
   +- {marker}
"""
        assert pg.violations_for("x", plan) == [], marker


def test_parser_rejects_large_limits():
    plan = """== Physical Plan ==
BroadcastNestedLoopJoin BuildRight, Cross
:- FileScan parquet [a#1]
+- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
   +- GlobalLimit 5000000
      +- FileScan parquet [b#2]
"""
    assert len(pg.violations_for("x", plan)) == 1
