"""Round-6 wave 2: bootstrap resampling, link prediction, and the
ranked-eval harness (gains/lift, AP, KS). Cross-engine value parity
lives in the DuckDB oracle gate; these tests pin the algorithmic
invariants on planted inputs."""

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries_mleval import (
    _N_BOOT,
    _POIS1_CDF32,
    _pois_case_sql,
)

SF = "/root/testdata/sf0.001"


def test_poisson_thresholds_match_closed_form():
    """The integer CDF thresholds must be floor(CDF_Poisson(1) * 2^32)
    — the ladder both engines share is derived, not hand-typed."""
    c = 0.0
    for k, t in enumerate(_POIS1_CDF32):
        c += math.exp(-1.0) / math.factorial(k)
        assert t == int(c * 2**32)
    # tail mass beyond weight 6 is negligible but nonzero
    assert _POIS1_CDF32[-1] < 2**32


def test_pois_case_sql_covers_all_arms():
    sql = _pois_case_sql("u")
    for k in range(6):
        assert f"THEN {k}" in sql
    assert sql.rstrip().endswith("ELSE 6 END")


def test_bootstrap_ci_brackets_point_estimate(spark):
    from data_pipeline_001_spark.plans.queries_mleval import (
        stats_bootstrap_ci,
    )

    row = stats_bootstrap_ci(spark, SF).collect()[0]
    assert row.n_resamples == _N_BOOT
    assert row.ci_lo <= row.point_mean <= row.ci_hi
    assert row.ci_lo < row.ci_hi


def test_bootstrap_weights_are_poissonish(spark):
    """Mean Poisson(1) weight over the full grid must be ~1 (the
    resample sizes concentrate around n), or the CI is biased."""
    from data_pipeline_001_spark.plans.queries_mleval import _POIS1_CDF32

    u = F.conv(
        F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = F.lit(6)
    for k, thr in reversed(list(enumerate(_POIS1_CDF32))):
        w = F.when(u < thr, F.lit(k)).otherwise(w)
    m = spark.range(20000).select(w.alias("w")).agg(F.avg("w")).collect()[0][0]
    assert 0.97 < m < 1.03


def test_link_prediction_excludes_existing_edges(spark):
    from data_pipeline_001_spark.operators.graph import copurchase_edges
    from data_pipeline_001_spark.plans.queries_mleval import (
        graph_link_prediction,
    )
    from data_pipeline_001_spark.session import load_tables

    got = graph_link_prediction(spark, SF)
    rows = got.collect()
    assert 0 < len(rows) <= 20
    edges = {
        (r.src, r.dst)
        for r in copurchase_edges(load_tables(spark, SF)["lineitem"])
        .select("src", "dst")
        .collect()
    }
    for r in rows:
        assert r.u < r.v
        assert (r.u, r.v) not in edges
        assert 0.0 < r.jaccard <= 1.0
        assert r.common_neighbors >= 1
        assert r.adamic_adar > 0.0
    # descending by jaccard with deterministic tiebreaks
    jac = [r.jaccard for r in rows]
    assert jac == sorted(jac, reverse=True)


def test_link_prediction_planted_wedge(spark):
    """Graph 1-2, 1-3 (wedge at 1): the only predicted link is (2, 3)
    with cn=1, jaccard = 1/(1+1-1) = 1, aa = 1/ln(2)."""
    from data_pipeline_001_spark.operators import graph as G

    li = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 3)],
        "l_orderkey long, l_partkey long",
    )
    edges = G.copurchase_edges(li)
    got = {(r.src, r.dst): r.weight for r in edges.collect()}
    assert got == {(1, 2): 1, (1, 3): 1}


def test_cumulative_gains_monotone_and_normalized(spark):
    from data_pipeline_001_spark.plans.queries_mleval import (
        ml_cumulative_gains,
    )

    rows = ml_cumulative_gains(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    gains = [r.cum_gain for r in rows]
    assert all(a <= b for a, b in zip(gains, gains[1:]))
    assert gains[-1] == pytest.approx(1.0)
    # final lift is 1 by construction (everything targeted)
    assert rows[-1].cum_lift == pytest.approx(1.0)


def test_average_precision_bounds(spark):
    from data_pipeline_001_spark.plans.queries_mleval import (
        ml_average_precision,
    )

    row = ml_average_precision(spark, SF).collect()[0]
    assert 0.0 <= row.baseline <= 1.0
    # AP of any ranking is at least ~the prevalence and at most 1
    assert row.baseline * 0.5 < row.average_precision <= 1.0
    assert row.n_pos <= row.n


def test_ks_matches_brute_force_on_sample(spark):
    """KS from the integer-argmax query must equal the brute-force
    max CDF gap computed driver-side on the same (small) table."""
    from data_pipeline_001_spark.plans.queries_mleval import (
        ml_ks_separation,
    )
    from data_pipeline_001_spark.session import load_tables

    row = ml_ks_separation(spark, SF).collect()[0]
    scored = (
        load_tables(spark, SF)["orders"]
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("s"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    pos = sorted(r.s for r in scored if r.y == 1)
    neg = sorted(r.s for r in scored if r.y == 0)
    ks = 0.0
    for t in sorted({r.s for r in scored}):
        import bisect

        cp = bisect.bisect_right(pos, t) / len(pos)
        cn = bisect.bisect_right(neg, t) / len(neg)
        ks = max(ks, abs(cp - cn))
    assert row.ks == pytest.approx(ks, abs=1e-6)
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
