"""Round-6 wave 7: Holt-Winters triple smoothing and nearest-as-of
join. Cross-engine parity lives in the oracle gate; these pin the
algorithmic invariants on planted inputs."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _round6(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _hw_reference(xs, a=0.3, b=0.05, g=0.2, p=7):
    l = _round6(sum(xs[:p]) / p)
    s = [_round6(x - l) for x in xs[:p]]
    bb = 0.0
    for x in xs[p:]:
        lnew = _round6(a * (x - s[0]) + (1 - a) * (l + bb))
        bb = _round6(b * (lnew - l) + (1 - b) * bb)
        snew = _round6(g * (x - lnew) + (1 - g) * s[0])
        s = s[1:] + [snew]
        l = lnew
    return l, bb, s


def test_holt_winters_matches_python_reference(spark):
    from data_pipeline_001_spark.plans.queries_forecast import (
        time_holt_winters,
    )
    from data_pipeline_001_spark.session import load_tables

    rows = time_holt_winters(spark, SF).collect()
    assert [r.h for r in rows] == list(range(1, 8))

    daily = (
        load_tables(spark, SF)["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("double")
                / 100.0
            ).alias("x")
        )
        .orderBy("day")
        .collect()
    )
    l, b, s = _hw_reference([r.x for r in daily])
    for r in rows:
        want = l + r.h * b + s[r.h - 1]
        assert r.forecast == pytest.approx(want, abs=2e-4)
        assert r.n_days == len(daily)
    assert rows[0].level == pytest.approx(l, abs=1e-4)
    assert rows[0].trend == pytest.approx(b, abs=1e-4)


def test_holt_winters_seasonal_state_rotates(spark):
    """On a pure period-7 signal with zero trend, forecasts must
    reproduce the seasonal pattern: f_h ≈ mean + s(h)."""
    xs = [100.0 + (i % 7) * 10.0 for i in range(70)]
    l, b, s = _hw_reference(xs)
    assert abs(b) < 1.0
    # each seasonal slot tracks its phase offset around the mean
    for h in range(1, 8):
        want = 100.0 + ((70 + h - 1) % 7) * 10.0
        assert l + h * b + s[h - 1] == pytest.approx(want, abs=5.0)


def test_asof_nearest_planted(spark):
    """Purchase at t=100s: clicks at 40s and 130s -> nearest is +30s
    (forward). Purchase at t=500s with clicks at 470s and 530s ->
    backward wins the exact tie. Purchase with no click within 1h is
    dropped."""
    from data_pipeline_001_spark.plans import queries_geo as G
    import data_pipeline_001_spark.session as sess

    base = dt.datetime(2024, 1, 1)

    def ev(eid, sec, uid, typ):
        return (eid, base + dt.timedelta(seconds=sec), uid, typ, 1.0)

    rows = [
        ev(1, 40, 1, "click"),
        ev(2, 100, 1, "purchase"),
        ev(3, 130, 1, "click"),
        ev(4, 470, 2, "click"),
        ev(5, 500, 2, "purchase"),
        ev(6, 530, 2, "click"),
        ev(7, 10_000, 3, "purchase"),
        ev(8, 10_000 + 4000, 3, "click"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    orig = sess.load_tables
    try:
        G.load_tables = lambda s, d: {"events": df}
        got = {
            r.purchase_id: (r.click_id, r.gap_us)
            for r in G.join_asof_nearest(spark, "x").collect()
        }
    finally:
        G.load_tables = orig
    assert got[2] == (3, 30_000_000)          # forward is nearer
    assert got[5] == (4, -30_000_000)         # exact tie -> backward
    assert 7 not in got                        # outside tolerance


def test_asof_nearest_real_data_invariants(spark):
    from data_pipeline_001_spark.plans.queries_geo import join_asof_nearest

    rows = join_asof_nearest(spark, SF).collect()
    assert rows
    ids = [r.purchase_id for r in rows]
    assert len(ids) == len(set(ids))           # at most one match each
    for r in rows:
        assert abs(r.gap_us) <= 3_600_000_000
        assert r.click_id != r.purchase_id


def test_forecast_backtest_invariants(spark):
    from data_pipeline_001_spark.plans.queries_forecast import (
        forecast_backtest,
    )

    rows = {r.method: r for r in forecast_backtest(spark, SF).collect()}
    assert set(rows) == {"drift", "naive", "seasonal_naive"}
    for r in rows.values():
        assert r.n_holdout == 28
        assert r.mae_dollars >= 0.0
        assert 0.0 <= r.mape_pct < 1000.0
    # drift differs from naive only by the slope correction term
    assert rows["drift"].mae_dollars != rows["seasonal_naive"].mae_dollars
