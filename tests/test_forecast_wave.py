"""Round-6 wave 3: Holt smoothing, seasonal decomposition, Kendall
tau-b, and l-diversity. Cross-engine value parity lives in the DuckDB
oracle gate; these pin the algorithmic invariants."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _round_half_up(x, nd):
    """Spark's F.round is HALF_UP; Python's round is banker's — the
    reference must match Spark at .5 boundaries."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _holt_reference(xs, alpha=0.3, beta=0.1):
    l, b = xs[0], 0.0
    for x in xs[1:]:
        l_new = _round_half_up(alpha * x + (1 - alpha) * (l + b), 6)
        b = _round_half_up(beta * (l_new - l) + (1 - beta) * b, 6)
        l = l_new
    return l, b


def test_holt_fold_matches_python_reference(spark):
    """The F.aggregate fold must reproduce the sequential recursion
    exactly (per-step 6-decimal rounds included)."""
    from data_pipeline_001_spark.plans.queries_forecast import (
        time_holt_forecast,
    )
    from data_pipeline_001_spark.session import load_tables

    rows = time_holt_forecast(spark, SF).collect()
    assert [r.h for r in rows] == [1, 2, 3]

    monthly = (
        load_tables(spark, SF)["orders"]
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m"))
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0
            ).alias("x")
        )
        .orderBy("m")
        .collect()
    )
    l, b = _holt_reference([r.x for r in monthly])
    assert rows[0].level == pytest.approx(_round_half_up(l, 4), abs=1e-9)
    assert rows[0].trend == pytest.approx(_round_half_up(b, 4), abs=1e-9)
    for r in rows:
        assert r.forecast == pytest.approx(_round_half_up(l + r.h * b, 4), abs=1e-9)
        assert r.n_months == len(monthly)


def test_seasonal_decompose_shape(spark):
    from data_pipeline_001_spark.plans.queries_forecast import (
        time_seasonal_decompose,
    )

    rows = time_seasonal_decompose(spark, SF).collect()
    assert [r.dow for r in rows] == list(range(7))
    # additive seasonal indices over a full cycle roughly cancel:
    # each day appears in ~the same number of centered windows
    total_weighted = sum(r.seasonal * r.n_days for r in rows)
    total_n = sum(r.n_days for r in rows)
    assert abs(total_weighted / total_n) < 0.1 * max(
        abs(r.seasonal) for r in rows
    ) + 1e-6


def test_kendall_tau_bounds_and_identity(spark):
    from data_pipeline_001_spark.plans.queries_forecast import (
        stats_kendall_tau,
    )

    row = stats_kendall_tau(spark, SF).collect()[0]
    assert -1.0 <= row.tau_b <= 1.0
    assert row.concordant + row.discordant <= row.n_pairs
    # daily revenue and order count must correlate positively
    assert row.tau_b > 0.2


def test_kendall_tau_perfect_orderings(spark):
    """tau-b = +1 on a strictly concordant series, -1 on a strictly
    discordant one (planted 5-point series, no ties)."""
    rows = [(i, i * 10, i + 1) for i in range(5)]
    df = spark.createDataFrame(rows, "day int, rc long, oc long")
    a, b = df.alias("a"), df.alias("b")
    sgn = (F.col("a.rc") - F.col("b.rc")) * (F.col("a.oc") - F.col("b.oc"))
    agg = a.join(b, F.col("a.day") < F.col("b.day")).agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).alias("nd"),
        F.count("*").alias("n0"),
    ).collect()[0]
    assert (agg.nc, agg.nd, agg.n0) == (10, 0, 10)


def test_l_diversity_flags_uniform_groups(spark):
    from data_pipeline_001_spark.plans.queries_forecast import (
        governance_l_diversity,
    )

    rows = governance_l_diversity(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.l_distinct <= 100
        assert r.below_l == (1 if r.l_distinct < 3 else 0)
        # entropy is at most ln(l) (uniform case), modulo the
        # 6-decimal output rounding
        assert -1e-6 <= r.entropy <= math.log(r.l_distinct) + 1e-6
