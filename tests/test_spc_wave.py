"""Round-6 wave 8: XmR control chart and Hampel filter. Cross-engine
parity lives in the oracle gate; these pin the invariants on planted
series."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_xmr_limits_bracket_mean(spark):
    from data_pipeline_001_spark.plans.queries_spc import quality_spc_xmr

    row = quality_spc_xmr(spark, SF).collect()[0]
    assert row.lcl < row.xbar < row.ucl
    assert row.mrbar > 0
    assert row.ucl - row.xbar == pytest.approx(
        row.xbar - row.lcl, abs=2e-4
    )
    # out-of-control points are the exception, not the rule
    assert row.n_above_ucl + row.n_below_lcl < row.n_days * 0.1


def test_hampel_flags_planted_spike(spark):
    """A flat series with one 10x spike must flag exactly the spike
    (MAD=0 there, so any deviation trips the scaled-integer test —
    with strict >, a zero deviation never does)."""
    from data_pipeline_001_spark.plans import queries_spc as S
    import data_pipeline_001_spark.session as sess
    import datetime as dt

    base = dt.datetime(1995, 1, 1)
    rows = []
    oid = 0
    for i in range(21):
        # two orders a day, constant 50.00 except day 10's 5000.00
        for price in (25.0, 25.0) if i != 10 else (2500.0, 2500.0):
            rows.append((oid, 1, "F", price, base + dt.timedelta(days=i),
                         "1-URGENT"))
            oid += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    orig = sess.load_tables
    try:
        S.load_tables = lambda s, d: {"orders": df}
        got = S.time_hampel_filter(spark, "x").collect()
    finally:
        S.load_tables = orig
    assert [r.day for r in got] == ["1995-01-11"]
    assert got[0].revenue == 5000.0
    assert got[0].rolling_median == 50.0
    assert got[0].rolling_mad == 0.0


def test_hampel_real_data_flags_are_extreme(spark):
    from data_pipeline_001_spark.plans.queries_spc import (
        time_hampel_filter,
    )

    rows = time_hampel_filter(spark, SF).collect()
    for r in rows:
        # every flagged day genuinely violates the 3-sigma-equivalent
        assert abs(r.revenue - r.rolling_median) > 3 * 1.4826 * r.rolling_mad - 0.02


def test_markov_attribution_invariants(spark):
    from data_pipeline_001_spark.plans.queries_geo import (
        events_markov_attribution,
    )

    rows = events_markov_attribution(spark, SF).collect()
    assert [r.channel for r in rows] == ["click", "error", "signup", "view"]
    shares = [r.attribution_share for r in rows]
    assert sum(shares) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        # removing inbound edges can only reduce absorption into conv
        assert 0.0 <= r.removal_effect <= 1.0
        assert 0.0 < r.p_conversion <= 1.0
    # the conversion probability is the same chain for every row
    assert len({r.p_conversion for r in rows}) == 1


def test_lag_features_consistency(spark):
    from data_pipeline_001_spark.plans.queries_spc import ml_lag_features

    rows = sorted(ml_lag_features(spark, SF).collect(), key=lambda r: r.day)
    assert rows
    by_day = {r.day: r for r in rows}
    for r in rows:
        assert r.rolling_min_7d <= r.rolling_mean_7d <= r.rolling_max_7d
        assert r.rolling_min_7d <= r.y <= r.rolling_max_7d
    # lag_1d of day t equals y of the previous feature row when both
    # feature rows exist and the days are calendar-adjacent
    import datetime as dt

    for r in rows:
        prev_day = (
            dt.date.fromisoformat(r.day) - dt.timedelta(days=1)
        ).isoformat()
        if prev_day in by_day:
            assert r.lag_1d == by_day[prev_day].y


def test_lagged_regression_matches_numpy(spark):
    import numpy as np

    from data_pipeline_001_spark.plans.queries_spc import (
        stats_lagged_regression,
    )
    from data_pipeline_001_spark.session import load_tables
    from pyspark.sql import functions as FF

    row = stats_lagged_regression(spark, SF).collect()[0]
    daily = (
        load_tables(spark, SF)["orders"]
        .groupBy(FF.col("o_orderdate").cast("date").alias("day"))
        .agg(
            FF.sum(FF.round(FF.col("o_totalprice") * 100).cast("long"))
            .alias("rev_c"),
            FF.count("*").alias("oc"),
        )
        .orderBy("day")
        .collect()
    )
    y = np.array([r.rev_c for r in daily[1:]], dtype=np.float64)
    x1 = np.array([r.rev_c for r in daily[:-1]], dtype=np.float64)
    x2 = np.array([r.oc for r in daily[:-1]], dtype=np.float64)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert row.beta_lag_revenue == pytest.approx(beta[1], abs=1e-4)
    assert row.beta_lag_orders == pytest.approx(beta[2], rel=1e-3, abs=1.0)
    assert row.intercept_dollars == pytest.approx(beta[0] / 100.0, rel=1e-3)
    assert row.r_squared == pytest.approx(1 - ss_res / ss_tot, abs=1e-4)
    assert row.n_days == len(y)


def test_dau_wau_mau_monotone_and_planted(spark):
    from data_pipeline_001_spark.plans import queries_spc as S
    import data_pipeline_001_spark.session as sess
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # user 1 active every day for 10 days; user 2 only on day 0;
    # user 3 on days 0 and 9
    rows = []
    eid = 0
    for d in range(10):
        active = [1] + ([2] if d == 0 else []) + ([3] if d in (0, 9) else [])
        for u in active:
            rows.append((eid, base + dt.timedelta(days=d), u, "view", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    orig = sess.load_tables
    try:
        S.load_tables = lambda s, d: {"events": df}
        got = {r.day: r for r in S.events_dau_wau_mau(spark, "x").collect()}
    finally:
        S.load_tables = orig
    assert got["2024-01-01"].dau == 3
    assert got["2024-01-02"].dau == 1
    # users 2 and 3 stay in the trailing-7 window through day 7
    assert got["2024-01-07"].wau == 3
    assert got["2024-01-08"].wau == 1
    # MAU covers the whole span; day 10 sees all three users
    assert got["2024-01-10"].mau == 3
    assert got["2024-01-10"].dau == 2  # users 1 and 3
    for r in got.values():
        assert r.dau <= r.wau <= r.mau
        assert 0.0 < r.stickiness <= 1.0


def test_dau_wau_mau_real_data_ordering(spark):
    from data_pipeline_001_spark.plans.queries_spc import events_dau_wau_mau

    rows = events_dau_wau_mau(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau <= r.mau


def test_power_user_curve_accounts_all_users(spark):
    from data_pipeline_001_spark.plans.queries_spc import (
        events_power_user_curve,
    )
    from data_pipeline_001_spark.session import load_tables

    rows = events_power_user_curve(spark, SF).collect()
    n_users = (
        load_tables(spark, SF)["events"]
        .where(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users
    assert sum(r.user_share for r in rows) == pytest.approx(1.0, abs=1e-3)
    days = [r.active_days for r in rows]
    assert days == sorted(days) and days[0] >= 1


def test_llr_collocations_prefer_frequent_surprise(spark):
    from data_pipeline_001_spark.plans.queries_spc import (
        text_collocations_llr,
    )

    rows = text_collocations_llr(spark, SF).collect()
    assert 0 < len(rows) <= 15
    llrs = [r.llr for r in rows]
    assert llrs == sorted(llrs, reverse=True)
    for r in rows:
        assert r.n_cooccur >= 3
        assert r.llr >= 0.0


def test_markov_attribution_planted_journeys(spark, tmp_path):
    """End-to-end check of the lag/lead edge derivation against an
    INDEPENDENT Python reference that implements the oracle's journey
    semantics literally (j = purchases strictly before; touches
    grouped per journey; first/mid/last/touchless edge classes). The
    planted stream exercises every edge class the real corpus rarely
    isolates: purchase-first users (touchless conv), consecutive
    purchases (two touchless convs in a row), trailing open journeys
    (last touch -> null), single-touch and multi-touch conversions,
    and a touches-only user."""
    import datetime as dt
    from collections import Counter, defaultdict

    from data_pipeline_001_spark.plans.queries_geo import (
        _MK_CHANNELS,
        _MK_STEPS,
        events_markov_attribution,
    )

    t0 = dt.datetime(2024, 1, 1)
    raw = []  # (user_id, event_type, minute_offset)
    # u1: touchless conv, then click->purchase, then trailing view
    raw += [(1, "purchase", 0), (1, "click", 1), (1, "purchase", 2),
            (1, "view", 3)]
    # u2: multi-touch conversion
    raw += [(2, "click", 0), (2, "view", 1), (2, "purchase", 2)]
    # u3: open journey only (touches, never converts)
    raw += [(3, "click", 0), (3, "click", 1)]
    # u4: consecutive purchases (two touchless convs)
    raw += [(4, "purchase", 0), (4, "purchase", 1)]
    # u5: single touch, never converts
    raw += [(5, "view", 0)]
    # u6: signup/error mix so every channel appears
    raw += [(6, "signup", 0), (6, "error", 1), (6, "purchase", 2),
            (6, "error", 3)]
    rows = [
        (eid, u, ty, t0 + dt.timedelta(minutes=m))
        for eid, (u, ty, m) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    # --- independent reference (oracle semantics, not lag/lead) ----
    edges = Counter()
    by_user = defaultdict(list)
    for eid, u, ty, ts in rows:
        by_user[u].append((ts, eid, ty))
    for u, evs in by_user.items():
        evs.sort()
        j, journeys = 0, defaultdict(list)
        for ts, eid, ty in evs:
            journeys[j].append(ty)
            if ty == "purchase":
                j += 1
        for seq in journeys.values():
            touches = [x for x in seq if x != "purchase"]
            conv = seq[-1] == "purchase"
            if not touches:
                if conv:
                    edges[("start", "conv")] += 1
                continue
            edges[("start", touches[0])] += 1
            for a, b in zip(touches, touches[1:]):
                edges[(a, b)] += 1
            edges[(touches[-1], "conv" if conv else "null")] += 1
    tot = Counter()
    for (s, _d), n in edges.items():
        tot[s] += n
    trans = {sd: n / tot[sd[0]] for sd, n in edges.items()}
    trans[("conv", "conv")] = 1.0
    trans[("null", "null")] = 1.0

    def absorbed(removed):
        tr = {}
        for (s, d), p in trans.items():
            if removed is not None and s == removed:
                continue
            dd = "null" if (removed is not None and d == removed) else d
            tr[(s, dd)] = tr.get((s, dd), 0.0) + p
        pi = {"start": 1.0}
        for _ in range(_MK_STEPS):
            new = {}
            for (s, d), p in tr.items():
                if s in pi:
                    new[d] = new.get(d, 0.0) + pi[s] * p
            pi = {d: round(v, 8) for d, v in new.items()}
        return pi.get("conv", 0.0)

    pf = absorbed(None)
    re_s = {c: round(1e6 * (1 - absorbed(c) / pf)) for c in _MK_CHANNELS}
    total_re = sum(re_s.values())
    expected = [
        (c, round(re_s[c] / 1e6, 6), round(re_s[c] / total_re, 6),
         round(pf, 6))
        for c in sorted(_MK_CHANNELS)
    ]

    got = [
        (r.channel, r.removal_effect, r.attribution_share, r.p_conversion)
        for r in events_markov_attribution(spark, str(tmp_path)).collect()
    ]
    assert got == [pytest.approx(e) for e in expected]


def test_markov_attribution_rejects_unmodeled_event_type(spark, tmp_path):
    """The chain's state list is a literal (unlike the oracle's
    data-derived CTE): an event_type outside it must raise loudly,
    never silently drop from the transition matrix."""
    import datetime as dt

    from data_pipeline_001_spark.plans.queries_geo import (
        events_markov_attribution,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, 1, "click", t0),
        (1, 1, "hover", t0 + dt.timedelta(minutes=1)),  # unmodeled
        (2, 1, "purchase", t0 + dt.timedelta(minutes=2)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="modeled chain states"):
        events_markov_attribution(spark, str(tmp_path)).collect()
