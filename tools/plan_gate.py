"""Registry-wide physical-plan gate: mechanical scale-killer detection.

Round 6's link-prediction pathology (a 1.48e9-row wedge explosion,
`queries_mleval.py` pre-fix) carried no smell a human scanned for and
cost a >900 s *runtime* discovery at sf1. This gate turns the per-wave
plan discipline into an invariant: every registered query's physical
plan is explained (analysis + optimization only — nothing executes for
the plan itself) and fails the build on the three operator classes that
kill 100 TB plans:

- ``CartesianProduct``     — an unconditioned full cross product;
- ``BatchEvalPython``      — a row-at-a-time Python UDF in the plan
                             (the allowed Python path is Arrow-batched:
                             ArrowEvalPython / MapInPandas /
                             FlatMapGroupsInPandas);
- ``BroadcastNestedLoopJoin`` whose *build side* is not provably
  bounded. BNLJ is O(left × build): fine when the build side is a
  global (keys=[]) aggregate — exactly one row — or a small literal
  limit/spine, catastrophic when it is data-sized.

Boundedness is decided structurally from the plan tree, not by name:
the BNLJ build-side subtree must contain a zero-key HashAggregate /
SortAggregate (1 row by construction), a GlobalLimit/TakeOrdered with a
small literal, a LocalTableScan (driver-side literal rows), or a small
literal Range. Everything else needs an entry in ``ALLOWLIST`` naming
the query and the boundedness argument — the documented-bounded cases
the round-6 verdict audited (e.g. Theil-Sen's calendar-bounded spine
pair join).

Run standalone for a report: ``python tools/plan_gate.py [sf_dir]``.
``tests/test_plan_gate.py`` imports ``violations_for`` and fails the
suite on any non-empty result.
"""

from __future__ import annotations

import re

#: query name -> reason its BroadcastNestedLoopJoin build side is
#: bounded even though the plan tree cannot prove it. Every entry MUST
#: state the bound. Keep this list short — prefer making the bound
#: visible in the plan (broadcast a global agg, a literal limit).
ALLOWLIST: dict[str, str] = {
    "stats_theil_sen": (
        "day_a < day_b inequality self-join of the daily revenue "
        "spine: the spine is calendar-bounded (~2.4k rows at any sf, "
        "~3M pairs constant), never corpus-sized (queries_er.py)"
    ),
    "events_power_user_curve": (
        "percentile-grid inequality join: distinct-user activity "
        "histogram (≤100 rows after the decile rollup) against a "
        "literal 100-point grid — both sides constant-bounded"
    ),
    "stats_mann_kendall": (
        "day_a < day_b inequality self-join of the daily revenue "
        "spine (calendar-bounded ~2.4k rows at any sf) — the same "
        "bounded pair join as Theil-Sen (queries_graph.py)"
    ),
    "stats_kendall_tau": (
        "inequality pair join over the calendar-bounded daily spine "
        "(~2.4k rows, ~3M pairs constant at any sf)"
    ),
    "join_cross_region_nation": (
        "intentional cross-join demo of the two constant dimension "
        "tables (5 regions × 25 nations = 125 rows at every sf)"
    ),
    "embedding_covariance": (
        "build side is the single (i=-1, j=-1) count row filtered "
        "from the d²-bounded cached Gram frame — 1 row by key, but "
        "the point-lookup filter is not structurally provable"
    ),
    "similarity_bruteforce_topk": (
        "build side is the ≤10-vector probe set (vec_id < 10 pushed "
        "filter); the corpus side streams — the documented brute-"
        "force ORACLE TWIN of the LSH/IVF scale paths, never the "
        "full-corpus plan (operators/similarity.py)"
    ),
    "dedup_embedding_cosine": (
        "exact O(n²) pairwise cosine — the documented small-sf "
        "ORACLE TWIN of dedup_embedding_lsh ('never the plan to run "
        "on a full corpus', queries_llm.py:548); exists to hash-"
        "check the scale path's recall"
    ),
    "agg_ab_experiment_lift": (
        "build side is the per-arm conversion summary — one row per "
        "experiment arm (2 arms), bounded by design cardinality"
    ),
}

#: substrings that prove a build-side subtree is bounded (≤ a handful
#: of rows by construction)
_BOUNDED_MARKERS = (
    re.compile(r"HashAggregate\(keys=\[\]"),  # global agg → 1 row
    re.compile(r"SortAggregate\(key=\[\]"),
    re.compile(r"ObjectHashAggregate\(keys=\[\]"),
    re.compile(r"LocalTableScan"),  # driver-side literal rows
    # createDataFrame over local literal rows plans as Scan
    # ExistingRDD; nothing in this package parallelizes a data-sized
    # RDD (DataFrame-first discipline), so ExistingRDD ⇒ driver-built
    # literal frame
    re.compile(r"Scan ExistingRDD"),
    re.compile(r"Subquery|ReusedSubquery"),
)
_LIMIT_RE = re.compile(r"GlobalLimit (\d+)|TakeOrderedAndProject\(limit=(\d+)")
_RANGE_RE = re.compile(r"Range \((\d+), (\d+)")
_MAX_BOUNDED_ROWS = 100_000  # a 100k-row broadcast build side is fine


def simple_plan(df) -> str:
    """Physical plan in 'simple' mode (tree with inline node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


_PREFIX_RE = re.compile(r"^((?::  |:- |\+- |   )*)(.*)$")


def _parse_tree(plan: str) -> list[tuple[int, str]]:
    """[(depth, node_text)] for the plan tree; depth from the 3-char
    indentation groups Spark's TreeNode.generateTreeString emits."""
    out = []
    for line in plan.splitlines():
        if not line.strip():
            continue
        m = _PREFIX_RE.match(line)
        prefix, body = m.group(1), m.group(2)
        if not body or body.startswith("=="):
            continue
        depth = len(prefix) // 3
        body = re.sub(r"^\*\(\d+\) ", "", body)  # codegen star
        out.append((depth, body))
    return out


def _subtree(nodes: list[tuple[int, str]], i: int) -> list[str]:
    d = nodes[i][0]
    out = [nodes[i][1]]
    for j in range(i + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        out.append(nodes[j][1])
    return out


def _children(nodes: list[tuple[int, str]], i: int) -> list[int]:
    d = nodes[i][0]
    kids = []
    for j in range(i + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        if nodes[j][0] == d + 1:
            kids.append(j)
    return kids


def _is_bounded(subtree: list[str]) -> bool:
    text = "\n".join(subtree)
    if any(p.search(text) for p in _BOUNDED_MARKERS):
        return True
    for m in _LIMIT_RE.finditer(text):
        n = int(m.group(1) or m.group(2))
        if n <= _MAX_BOUNDED_ROWS:
            return True
    for m in _RANGE_RE.finditer(text):
        if int(m.group(2)) - int(m.group(1)) <= _MAX_BOUNDED_ROWS:
            return True
    return False


def violations_for(name: str, plan: str) -> list[str]:
    """Scale-killer findings for one query's simple-mode plan."""
    bad: list[str] = []
    if "CartesianProduct" in plan:
        bad.append("CartesianProduct (unconditioned cross product)")
    if "BatchEvalPython" in plan:
        bad.append("BatchEvalPython (row-at-a-time Python UDF)")
    nodes = _parse_tree(plan)
    for i, (_, body) in enumerate(nodes):
        if not body.startswith("BroadcastNestedLoopJoin"):
            continue
        kids = _children(nodes, i)
        if len(kids) != 2:
            # ReusedExchange flattening etc. — be conservative
            build = [b for _, b in nodes[i:]]
        elif "BuildLeft" in body:
            build = _subtree(nodes, kids[0])
        else:  # BuildRight (the default)
            build = _subtree(nodes, kids[1])
        if _is_bounded(build):
            continue
        if name in ALLOWLIST:
            continue
        detail = next(
            (
                b
                for b in build
                if not b.startswith(("BroadcastExchange", "Project", "Filter"))
            ),
            build[0],
        )
        bad.append(
            "BroadcastNestedLoopJoin with unproven build side: "
            + detail[:120]
        )
    return bad


def gate_registry(sf_dir: str, only=None, verbose=True):
    """(violations, n_checked, n_bnlj_allowed) across the registry."""
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from data_pipeline_001_spark.session import get_spark

    spark = get_spark(app_name="plan_gate", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()
    violations: dict[str, list[str]] = {}
    n_bnlj_allowed = 0
    t0 = time.time()
    names = [n for n in registry if not only or n in only]
    for k, qname in enumerate(names):
        try:
            plan = simple_plan(registry[qname](spark, sf_dir))
        except Exception as exc:  # plan build crash is a violation too
            violations[qname] = [f"plan build failed: {exc!r:.200}"]
            continue
        bad = violations_for(qname, plan)
        if bad:
            violations[qname] = bad
        if qname in ALLOWLIST and "BroadcastNestedLoopJoin" in plan:
            n_bnlj_allowed += 1
        if verbose and (k + 1) % 50 == 0:
            print(
                f"  ... {k + 1}/{len(names)} plans "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    if verbose:
        print(
            f"checked {len(names)} plans in {time.time() - t0:.0f}s; "
            f"{len(violations)} violations; "
            f"{n_bnlj_allowed} allowlisted BNLJ"
        )
        for n, bad in violations.items():
            for b in bad:
                print(f"  FAIL {n}: {b}")
    return violations, len(names), n_bnlj_allowed


if __name__ == "__main__":
    import sys

    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    vio, n, _ = gate_registry(sf, only=set(args[1:]) or None)
    sys.exit(1 if vio else 0)
