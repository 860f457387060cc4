"""Round-6 wave 4: grid-blocked haversine join and touch attribution.
Cross-engine parity lives in the oracle gate (the geo oracle is the
brute-force all-pairs scan, so the blocking-completeness theorem is
checked there); these pin the local invariants."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _haversine(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(
        dl / 2
    ) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def test_geo_pairs_within_radius_and_canonical(spark):
    from data_pipeline_001_spark.plans.queries_geo import (
        geo_haversine_pairs,
    )

    rows = geo_haversine_pairs(spark, SF).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.0 <= r.dist_km <= 25.0


def test_geo_planted_coordinates_are_engine_stable(spark):
    """The md5-derived lat/lon must live in the declared band — the
    completeness proof needs |lat| <= 60."""
    from data_pipeline_001_spark.session import load_tables

    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("lat|"), F.col("c_custkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") / F.lit(4294967296.0)
    lat = F.lit(-60.0) + F.lit(120.0) * u
    mm = (
        load_tables(spark, SF)["customer"]
        .agg(F.min(lat).alias("lo"), F.max(lat).alias("hi"))
        .collect()[0]
    )
    assert -60.0 <= mm.lo <= mm.hi <= 60.0


def test_geo_grid_blocking_matches_brute_force(spark):
    """On a planted 5-point cloud, the grid plan's pair set equals the
    brute-force pair set (including a near-cell-border pair)."""
    pts = [
        (1, 10.001, 20.001),
        (2, 10.002, 20.002),   # ~0.15 km from 1
        (3, 10.499, 20.001),   # near the 0.5-degree cell border, ~55 km N
        (4, 10.300, 20.001),   # ~33 km from 1, ~22 km from 3
        (5, -45.0, 100.0),     # far away
    ]
    brute = {
        (a[0], b[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1:]
        if _haversine(a[1], a[2], b[1], b[2]) <= 25.0
    }
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    cell = df.select(
        "id",
        "lat",
        "lon",
        F.floor(F.col("lat") / 0.5).alias("cy"),
        F.floor(F.col("lon") / 0.5).alias("cx"),
    )
    offs = F.explode(
        F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    )
    probe = cell.select(
        F.col("id").alias("id_a"), F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"), "cy", "cx", offs.alias("o"),
    ).select(
        "id_a", "lat_a", "lon_a",
        (F.col("cy") + F.col("o.dy")).alias("jy"),
        (F.col("cx") + F.col("o.dx")).alias("jx"),
    )
    build = cell.select(
        F.col("id").alias("id_b"), F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"), F.col("cy").alias("jy"),
        F.col("cx").alias("jx"),
    )
    d = F.lit(2.0 * 6371.0088) * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(F.col("lat_b") - F.col("lat_a")) / 2), 2)
        + F.cos(F.radians("lat_a")) * F.cos(F.radians("lat_b"))
        * F.pow(F.sin(F.radians(F.col("lon_b") - F.col("lon_a")) / 2), 2)
    ))
    got = {
        (r.id_a, r.id_b)
        for r in probe.join(build, ["jy", "jx"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(d <= 25.0)
        .collect()
    }
    assert got == brute
    assert (1, 2) in got and (3, 4) in got


def test_attribution_planted_journeys(spark):
    """User 1: view, click, purchase(10), signup, purchase(20) — two
    journeys; first purchase attributes first=view/last=click, second
    first=signup/last=signup. User 2: purchase with no touches →
    '(none)'."""
    from data_pipeline_001_spark.plans import queries_geo as G
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "view", 0.0),
        (1, base + dt.timedelta(minutes=1), 1, "click", 0.0),
        (2, base + dt.timedelta(minutes=2), 1, "purchase", 10.0),
        (3, base + dt.timedelta(minutes=3), 1, "signup", 0.0),
        (4, base + dt.timedelta(minutes=4), 1, "purchase", 20.0),
        (5, base, 2, "purchase", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    import data_pipeline_001_spark.session as sess

    orig = sess.load_tables
    try:
        sess.load_tables = lambda s, d: {"events": df}
        G.load_tables = sess.load_tables
        got = {
            (r.model, r.touch_type): (r.n_conversions, r.total_value)
            for r in G.events_attribution_touch(spark, "unused").collect()
        }
    finally:
        sess.load_tables = orig
        G.load_tables = orig
    assert got[("first_touch", "view")] == (1, 10.0)
    assert got[("last_touch", "click")] == (1, 10.0)
    assert got[("first_touch", "signup")] == (1, 20.0)
    assert got[("last_touch", "signup")] == (1, 20.0)
    assert got[("first_touch", "(none)")] == (1, 5.0)
    assert got[("last_touch", "(none)")] == (1, 5.0)


def test_attribution_value_conservation(spark):
    """Each model attributes every conversion exactly once: per-model
    n_conversions and total_value equal the purchase totals."""
    from data_pipeline_001_spark.plans.queries_geo import (
        events_attribution_touch,
    )
    from data_pipeline_001_spark.session import load_tables

    rows = events_attribution_touch(spark, SF).collect()
    purchases = (
        load_tables(spark, SF)["events"]
        .where(F.col("user_id").isNotNull())
        .where(F.col("event_type") == "purchase")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
            .alias("v"),
        )
        .collect()[0]
    )
    for model in ("first_touch", "last_touch"):
        sub = [r for r in rows if r.model == model]
        assert sum(r.n_conversions for r in sub) == purchases.n
        assert sum(r.total_value for r in sub) == pytest.approx(
            purchases.v, abs=0.05
        )
