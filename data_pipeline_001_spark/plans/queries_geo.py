"""Round-6 wave 4: geospatial radius join and marketing attribution.

Two surfaces (SURVEY.md §2.13 scope):

* ``geo_haversine_pairs`` — all point pairs within 25 km, via
  grid-cell blocking + haversine refine. Coordinates are planted
  deterministically from the customer key (md5-uniform lat/lon), so
  both engines see identical points; the ORACLE is the brute-force
  all-pairs scan, which independently verifies the 3x3-neighborhood
  completeness theorem the Spark plan relies on.
* ``events_attribution_touch`` — first-touch / last-touch conversion
  attribution over per-user journeys (events between consecutive
  purchases), the marketing-science read of the event log.

NOTE: this module must stay LAST in ``__spark_entry__._registry``'s
import order — new registry entries queue behind the pinned coverage
backlog so the driver's prefix sample converges.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

# ---------------------------------------------------------------------
# Grid-blocked haversine radius join
# ---------------------------------------------------------------------

_GEO_RADIUS_KM = 25.0
_GEO_CELL_DEG = 0.5
_EARTH_R_KM = 6371.0088

# Planted coordinates: lat in [-60, 60], lon in [-180, 180], each an
# md5-derived 32-bit uniform scaled linearly — exact integer / 2^32
# then one multiply+add, bit-identical across engines. The +-60
# latitude clamp keeps every 0.5-degree lon cell wider than the 25 km
# radius (111.3 km * 0.5 * cos(60 deg) = 27.8 km), which is what makes
# the 3x3 cell neighborhood a COMPLETE candidate set.
_LAT_SQL = (
    "(-60.0 + 120.0 * (('0x' || substr(md5('lat|' || CAST(c_custkey AS "
    "VARCHAR)), 1, 8))::UBIGINT / 4294967296.0))"
)
_LON_SQL = (
    "(-180.0 + 360.0 * (('0x' || substr(md5('lon|' || CAST(c_custkey AS "
    "VARCHAR)), 1, 8))::UBIGINT / 4294967296.0))"
)

# Brute-force oracle: ALL pairs, no blocking — independently proves
# the Spark side's grid candidate set misses nothing (quadratic is
# fine at the sf0.01 gate; the established bounded-twin discipline).
_GEO_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM customer
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         2.0 * {_EARTH_R_KM} * ASIN(SQRT(
           POW(SIN(RADIANS(b.lat - a.lat) / 2), 2)
           + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
             * POW(SIN(RADIANS(b.lon - a.lon) / 2), 2)
         )) AS d
  FROM pts a JOIN pts b ON a.id < b.id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       ROUND(d, 4) AS dist_km
FROM pairs WHERE d <= {_GEO_RADIUS_KM}
"""


@query("geo_haversine_pairs", _GEO_ORACLE)
def geo_haversine_pairs(spark, sf_dir):
    """All customer pairs within 25 km (planted md5-uniform
    coordinates): grid-cell blocking + haversine refine.

    Each point lands in one 0.5-degree cell; the LEFT side explodes to
    its 3x3 cell neighborhood, the RIGHT side stays home, so every
    qualifying pair is generated exactly once (the right point's home
    cell is exactly one of the left's nine) and the join is an
    EQUI-join on the cell key — shuffle-partitionable, never
    quadratic. The latitude band keeps every cell wider than the
    radius, making the neighborhood provably complete — and the
    ORACLE is the brute-force all-pairs scan, so that completeness
    theorem is cross-checked, not assumed. At 100 TB this is the
    spatial-join shape that survives: candidates scale with local
    density, not corpus size squared. Pairs spanning the +-180
    antimeridian are out of scope (no planted point within 25 km of
    it matters at these densities; both plan and oracle use the same
    great-circle distance so the contract is unaffected).

    Float note: sin/cos/asin may differ by ~1 ulp across engines
    (~1e-15 km here), absorbed by the 4-decimal round; a pair landing
    within 1e-15 km of the 25 km cutoff could in principle flip — at
    ~5e-16 probability per pair, accepted and documented."""
    t = load_tables(spark, sf_dir)
    u_lat = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("lat|"), F.col("c_custkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") / F.lit(4294967296.0)
    u_lon = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("lon|"), F.col("c_custkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") / F.lit(4294967296.0)
    pts = t["customer"].select(
        F.col("c_custkey").alias("id"),
        (F.lit(-60.0) + F.lit(120.0) * u_lat).alias("lat"),
        (F.lit(-180.0) + F.lit(360.0) * u_lon).alias("lon"),
    )
    cell_y = F.floor(F.col("lat") / _GEO_CELL_DEG)
    cell_x = F.floor(F.col("lon") / _GEO_CELL_DEG)
    home = pts.select(
        "id", "lat", "lon", cell_y.alias("cy"), cell_x.alias("cx")
    )
    offs = F.explode(
        F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    )
    probe = home.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        "cy",
        "cx",
        offs.alias("o"),
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.col("cy") + F.col("o.dy")).alias("jy"),
        (F.col("cx") + F.col("o.dx")).alias("jx"),
    )
    build = home.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cy").alias("jy"),
        F.col("cx").alias("jx"),
    )
    joined = probe.join(build, ["jy", "jx"]).where(
        F.col("id_a") < F.col("id_b")
    )
    d = (
        F.lit(2.0 * _EARTH_R_KM)
        * F.asin(
            F.sqrt(
                F.pow(
                    F.sin(F.radians(F.col("lat_b") - F.col("lat_a")) / 2), 2
                )
                + F.cos(F.radians("lat_a"))
                * F.cos(F.radians("lat_b"))
                * F.pow(
                    F.sin(F.radians(F.col("lon_b") - F.col("lon_a")) / 2), 2
                )
            )
        )
    )
    return (
        joined.select("id_a", "id_b", d.alias("d"))
        .where(F.col("d") <= _GEO_RADIUS_KM)
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.round("d", 4).alias("dist_km"),
        )
    )


# ---------------------------------------------------------------------
# First-/last-touch conversion attribution
# ---------------------------------------------------------------------


@query(
    "events_attribution_touch",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS value_c,
             COALESCE(
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS journey
      FROM events WHERE user_id IS NOT NULL
    ),
    conv AS (
      SELECT user_id, journey, value_c
      FROM seq WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, journey,
             FIRST(event_type ORDER BY ts, event_id) AS first_touch,
             LAST(event_type ORDER BY ts, event_id) AS last_touch
      FROM seq WHERE event_type <> 'purchase'
      GROUP BY user_id, journey
    ),
    attributed AS (
      SELECT m.model,
             COALESCE(CASE WHEN m.model = 'first_touch'
                           THEN t.first_touch ELSE t.last_touch END,
                      '(none)') AS touch_type,
             c.value_c
      FROM conv c
      LEFT JOIN touches t
        ON t.user_id = c.user_id AND t.journey = c.journey
      CROSS JOIN (SELECT UNNEST(['first_touch', 'last_touch']) AS model) m
    )
    SELECT model, touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(SUM(value_c) / 100.0, 2) AS total_value
    FROM attributed GROUP BY model, touch_type
    """,
)
def events_attribution_touch(spark, sf_dir):
    """First-touch and last-touch conversion attribution: each
    purchase's journey is the event run since the user's previous
    purchase; credit goes to the journey's first (resp. last)
    non-purchase event type. Journey segmentation is one cumulative
    window (count of PRIOR purchases — the purchase itself stays in
    the journey it closes); touch selection is deterministic
    min_by/max_by on the exact (ts, event_id) key; conversion value
    sums in integer cents. Purchases with no preceding touch
    attribute to '(none)'. One window + one aggregate + one join —
    the per-user journey state never leaves the user's partition."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("value_c"),
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).over(w),
                F.lit(0),
            ).alias("journey"),
        )
    )
    conv = seq.where(F.col("event_type") == "purchase").select(
        "user_id", "journey", "value_c"
    )
    key = F.struct("ts", "event_id")
    touches = (
        seq.where(F.col("event_type") != "purchase")
        .groupBy("user_id", "journey")
        .agg(
            F.min_by("event_type", key).alias("first_touch"),
            F.max_by("event_type", key).alias("last_touch"),
        )
    )
    models = spark.createDataFrame(
        [("first_touch",), ("last_touch",)], "model string"
    )
    attributed = (
        conv.join(touches, ["user_id", "journey"], "left")
        .crossJoin(F.broadcast(models))
        .select(
            "model",
            F.coalesce(
                F.when(
                    F.col("model") == "first_touch", F.col("first_touch")
                ).otherwise(F.col("last_touch")),
                F.lit("(none)"),
            ).alias("touch_type"),
            "value_c",
        )
    )
    return attributed.groupBy("model", "touch_type").agg(
        F.count("*").cast("long").alias("n_conversions"),
        F.round(F.sum("value_c") / 100.0, 2).alias("total_value"),
    )


# ---------------------------------------------------------------------
# Nearest as-of join with tolerance
# ---------------------------------------------------------------------

_ASOF_TOL_US = 3_600_000_000  # 1 hour


@query(
    "join_asof_nearest",
    f"""
    WITH seq AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS us
      FROM events
      WHERE user_id IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    marked AS (
      SELECT user_id, event_type, event_id, us,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN us END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS prev_us,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS prev_id,
             FIRST_VALUE(CASE WHEN event_type = 'click' THEN us END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_us,
             FIRST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_id
      FROM seq
    ),
    chosen AS (
      SELECT event_id AS purchase_id, user_id,
             CASE WHEN prev_us IS NOT NULL
                       AND (next_us IS NULL
                            OR us - prev_us <= next_us - us)
                  THEN prev_id ELSE next_id END AS click_id,
             CASE WHEN prev_us IS NOT NULL
                       AND (next_us IS NULL
                            OR us - prev_us <= next_us - us)
                  THEN prev_us - us ELSE next_us - us END AS gap_us
      FROM marked WHERE event_type = 'purchase'
    )
    SELECT CAST(purchase_id AS BIGINT) AS purchase_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(click_id AS BIGINT) AS click_id,
           CAST(gap_us AS BIGINT) AS gap_us
    FROM chosen
    WHERE click_id IS NOT NULL AND ABS(gap_us) <= {_ASOF_TOL_US}
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest as-of join with tolerance (the pandas ``merge_asof
    direction='nearest'`` semantics, distributed): each purchase
    matches its temporally NEAREST click by the same user within ±1
    hour — backward wins exact ties. Completes the as-of family
    (``join_asof_events_spine`` is backward-only).

    Shape: union both streams, one user-partitioned ordered window
    computing last-click-before and first-click-after via
    IGNORE NULLS window frames, then a constant-width comparison —
    never a range join, never quadratic, and the state stays inside
    the user's partition (the sessionizer's scale posture). All
    arithmetic is exact integer microseconds; the purchase row itself
    can never match (only 'click' rows populate the frames). A click
    at the exact purchase timestamp counts as backward (gap 0)."""
    t = load_tables(spark, sf_dir)
    seq = (
        t["events"]
        .where(
            F.col("user_id").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("us"),
        )
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    click_us = F.when(F.col("event_type") == "click", F.col("us"))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    marked = seq.select(
        "user_id",
        "event_type",
        "event_id",
        "us",
        F.last(click_us, ignorenulls=True).over(wb).alias("prev_us"),
        F.last(click_id, ignorenulls=True).over(wb).alias("prev_id"),
        F.first(click_us, ignorenulls=True).over(wf).alias("next_us"),
        F.first(click_id, ignorenulls=True).over(wf).alias("next_id"),
    )
    take_prev = F.col("prev_us").isNotNull() & (
        F.col("next_us").isNull()
        | (F.col("us") - F.col("prev_us") <= F.col("next_us") - F.col("us"))
    )
    chosen = marked.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(take_prev, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("click_id"),
        F.when(take_prev, F.col("prev_us") - F.col("us"))
        .otherwise(F.col("next_us") - F.col("us"))
        .alias("gap_us"),
    )
    return chosen.where(
        F.col("click_id").isNotNull()
        & (F.abs(F.col("gap_us")) <= _ASOF_TOL_US)
    ).select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("click_id").cast("long").alias("click_id"),
        F.col("gap_us").cast("long").alias("gap_us"),
    )


# ---------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------

_MK_CHANNELS = ("click", "error", "signup", "view")
_MK_STEPS = 12


def _mk_head_sql() -> str:
    """Journey-transition CTEs shared by the full chain and every
    removal variant: start -> first touch, touch -> touch,
    last touch -> conv/null, start -> conv for touchless purchases;
    absorbing self-loops appended."""
    return """
seq AS (
  SELECT user_id, event_type, ts, event_id,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS j
  FROM events WHERE user_id IS NOT NULL
),
jmeta AS (
  SELECT user_id, j,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM seq GROUP BY user_id, j
),
touches AS (
  SELECT user_id, j, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, j
                            ORDER BY ts, event_id) AS r,
         COUNT(*) OVER (PARTITION BY user_id, j) AS nt,
         LEAD(event_type) OVER (PARTITION BY user_id, j
                                ORDER BY ts, event_id) AS nxt
  FROM seq WHERE event_type <> 'purchase'
),
raw_edges AS (
  SELECT 'start' AS src, event_type AS dst FROM touches WHERE r = 1
  UNION ALL
  SELECT event_type, nxt FROM touches WHERE nxt IS NOT NULL
  UNION ALL
  SELECT t.event_type,
         CASE WHEN m.conv = 1 THEN 'conv' ELSE 'null' END
  FROM touches t
  JOIN jmeta m ON m.user_id = t.user_id AND m.j = t.j
  WHERE t.r = t.nt
  UNION ALL
  SELECT 'start', 'conv' FROM jmeta m
  WHERE m.conv = 1 AND NOT EXISTS (
    SELECT 1 FROM touches t WHERE t.user_id = m.user_id AND t.j = m.j)
),
tcnt AS (SELECT src, dst, COUNT(*) AS n FROM raw_edges GROUP BY 1, 2),
tot AS (SELECT src, SUM(n) AS rt FROM tcnt GROUP BY 1),
trans_full AS (
  SELECT src, dst, n / CAST(rt AS DOUBLE) AS p
  FROM tcnt JOIN tot USING (src)
  UNION ALL SELECT 'conv', 'conv', CAST(1.0 AS DOUBLE)
  UNION ALL SELECT 'null', 'null', CAST(1.0 AS DOUBLE)
)
"""


def _mk_oracle() -> str:
    parts = [_mk_head_sql().strip()]
    chains = [("full", None)] + [(c, c) for c in _MK_CHANNELS]
    for tag, removed in chains:
        if removed is not None:
            parts.append(f"""
trans_{tag} AS (
  SELECT src,
         CASE WHEN dst = '{removed}' THEN 'null' ELSE dst END AS dst,
         SUM(p) AS p
  FROM trans_full WHERE src <> '{removed}' GROUP BY 1, 2
)""")
        parts.append(
            f"p_{tag}_0 AS (SELECT 'start' AS state, "
            f"CAST(1.0 AS DOUBLE) AS pi)"
        )
        for k in range(1, _MK_STEPS + 1):
            parts.append(f"""
p_{tag}_{k} AS (
  SELECT tr.dst AS state, ROUND(SUM(p.pi * tr.p), 8) AS pi
  FROM trans_{tag} tr JOIN p_{tag}_{k - 1} p ON p.state = tr.src
  GROUP BY tr.dst
)""")
    res_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, "
        f"(SELECT pi FROM p_full_{_MK_STEPS} WHERE state = 'conv') AS pf, "
        f"COALESCE((SELECT pi FROM p_{c}_{_MK_STEPS} "
        f"WHERE state = 'conv'), 0.0) AS pc"
        for c in _MK_CHANNELS
    )
    return (
        "WITH "
        + ",".join(parts)
        + f""",
res AS ({res_rows}),
scaled AS (
  SELECT channel, pf,
         CAST(ROUND(1000000 * (1 - pc / pf)) AS BIGINT) AS re_s
  FROM res
)
SELECT channel,
       ROUND(re_s / 1000000.0, 6) AS removal_effect,
       ROUND(re_s / CAST(SUM(re_s) OVER () AS DOUBLE), 6)
         AS attribution_share,
       ROUND(pf, 6) AS p_conversion
FROM scaled ORDER BY channel
"""
    )


@query("events_markov_attribution", _mk_oracle())
def events_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution (Anderl et al. 2014, public):
    model journeys as a first-order chain over touch types with
    absorbing 'conv'/'null' states, estimate the 12-step
    conversion probability from 'start', and credit each channel by
    how much conversion drops when that channel's inbound transitions
    are redirected to 'null' — the data-driven alternative to the
    first/last-touch heuristics of ``events_attribution_touch``.

    Scale shape (round-8 rework): ONE lag/lead window over user_id
    derives every oracle edge class — within a user's ordered stream a
    journey's rows are contiguous and its terminating purchase is the
    last row, so first/mid/last/touchless edges are decidable from the
    neighboring event types alone (no journey numbering, no jmeta
    join, no union re-derivation). After the (src, dst) count shuffle
    the chain is a <=7x7 matrix however large the corpus, so it is
    collapsed to a SINGLE ROW (zero-key collect_list -> map) and all
    5 chains x 12 power steps run as ONE higher-order-function
    expression with per-step round-8 (the PageRank/Markov-stationary
    rounding discipline). The previous form expressed each power step
    as a join against the transition frame, re-deriving the events
    lineage per lazy branch: 108 s isolated at sf1 vs ~14 s for this
    shape (6.5 s plan construction + ~5 s first-scan execution) (sweep_sf1, round 8). Removal effects are integer-scaled
    before normalization so the shares come from one exact integer
    sum, not an order-dependent float sum."""
    t = load_tables(spark, sf_dir)
    # --- edge derivation: ONE window over user_id ---------------------
    #   first touch    <=> touch whose prev is a purchase or nothing
    #   mid edge       <=> touch whose next is a touch
    #   last touch     <=> touch whose next is a purchase (-> conv) or
    #                      nothing (-> null: the trailing open journey)
    #   touchless conv <=> purchase whose prev is a purchase or nothing
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.lag("event_type").over(w).alias("prv"),
            F.lead("event_type").over(w).alias("nxt"),
        )
    )
    is_touch = F.col("event_type") != "purchase"
    at_journey_start = F.col("prv").isNull() | (F.col("prv") == "purchase")

    def edge(s, d):
        return F.struct(s.alias("src"), d.alias("dst"))

    raw = ev.select(
        F.explode(
            F.filter(
                F.array(
                    # a NULL event_type would otherwise emit no edges
                    # (every is_touch branch is NULL-false) while still
                    # distorting its neighbors' prv/nxt — surface it as
                    # an invalid edge so the state guard below raises
                    F.when(
                        F.col("event_type").isNull(),
                        edge(F.lit("__invalid__"), F.lit("__invalid__")),
                    ),
                    F.when(
                        is_touch & at_journey_start,
                        edge(F.lit("start"), F.col("event_type")),
                    ),
                    F.when(
                        is_touch,
                        edge(
                            F.col("event_type"),
                            F.when(F.col("nxt").isNull(), F.lit("null"))
                            .when(F.col("nxt") == "purchase", F.lit("conv"))
                            .otherwise(F.col("nxt")),
                        ),
                    ),
                    F.when(
                        ~is_touch & at_journey_start,
                        edge(F.lit("start"), F.lit("conv")),
                    ),
                ),
                lambda e: e.isNotNull(),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    tcnt = raw.groupBy("src", "dst").agg(F.count("*").alias("n"))
    tot = tcnt.groupBy("src").agg(F.sum("n").alias("rt"))
    trans_full = tcnt.join(tot, "src").select(
        "src", "dst", (F.col("n") / F.col("rt").cast("double")).alias("p")
    )
    # --- bounded-matrix localization ----------------------------------
    # (src, dst) keys are drawn from {start} x channels x {conv, null}
    # (7 states), so the whole transition table fits in ONE map cell
    # of ONE row — a zero-key aggregate the plan gate proves bounded.
    # The state list is a LITERAL (unlike the oracle's data-derived
    # CTE states), so an event_type outside the modeled channel set
    # would silently drop from the matrix: the same aggregate counts
    # such keys and the pf expression raises loudly if any exist.
    states = ("start",) + _MK_CHANNELS + ("conv", "null")
    conv_i = states.index("conv")
    known = F.col("src").isin(*states) & F.col("dst").isin(*states)
    mat = trans_full.groupBy().agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.concat_ws("|", "src", "dst").alias("k"),
                    F.col("p").alias("v"),
                )
            )
        ).alias("m"),
        # coalesce: sum over ZERO edge rows is NULL, and
        # assert_true(NULL) raises — an empty corpus must read as
        # "0 unknown states", not as the unmodeled-type error
        F.coalesce(
            F.sum(F.when(~known, 1).otherwise(0)), F.lit(0)
        ).alias("_unknown"),
    )

    # matrix cells and the power iteration are generated as SQL TEXT
    # (one selectExpr per stage, two Py4J calls total): the same plan
    # built through per-cell Column objects costs ~2000 Py4J round
    # trips — measured 6.5 s of driver-side construction at any sf
    def p_full(src: str, dst: str) -> str:
        # absorbing self-loops are structural, not data rows
        if src in ("conv", "null"):
            return "1.0D" if dst == src else "0.0D"
        return f"coalesce(m['{src}|{dst}'], 0.0D)"

    def p_chain(tag: str, src: str, dst: str) -> str:
        # removal chain: drop the removed state's outbound row,
        # redirect its inbound mass to 'null' (oracle's trans_{tag})
        if tag == "full" or src in ("conv", "null"):
            return p_full(src, dst)
        if src == tag or dst == tag:
            return "0.0D"
        if dst == "null":
            return f"({p_full(src, 'null')} + {p_full(src, tag)})"
        return p_full(src, dst)

    tags = ("full",) + _MK_CHANNELS
    mats = mat.selectExpr(
        "_unknown",
        *[
            "array(%s) AS M_%s"
            % (
                ", ".join(
                    "array(%s)"
                    % ", ".join(p_chain(tag, si, sj) for sj in states)
                    for si in states
                ),
                tag,
            )
            for tag in tags
        ]
    )

    # --- 12-step power iteration as ONE higher-order expression -------
    # pi_k[j] = round(sum_i pi_{k-1}[i] * P[i][j], 8): an aggregate
    # over a literal 12-step sequence whose accumulator is the 7-
    # vector — constant-size expression tree, no per-step joins
    k = len(states)
    init = "array(1.0D" + ", 0.0D" * (k - 1) + ")"

    def absorbed(tag: str) -> str:
        return (
            f"element_at(aggregate(sequence(1, {_MK_STEPS}), {init}, "
            f"(acc, _k) -> transform(sequence(0, {k - 1}), "
            f"j -> round(aggregate(sequence(0, {k - 1}), 0.0D, "
            f"(s, i) -> s + element_at(acc, i + 1) "
            f"* element_at(element_at(M_{tag}, i + 1), j + 1)), 8))), "
            f"{conv_i + 1})"
        )

    # assert_true rides on pf (not its own column — pruning would drop
    # it): NULL when the contract holds, a loud error otherwise.
    # OPERATIONAL RESPONSE (round-9 advice): this error means a new
    # event_type reached the journey stream — a schema-valid row the
    # oracle's data-derived CTE would silently absorb but the literal
    # 7-state matrix cannot. The fix is to extend _MK_CHANNELS (one
    # tuple edit; matrix/chains/oracle all derive from it), NOT to
    # relax the guard: silently dropping a channel's transitions
    # mis-attributes every journey it appears in. The message carries
    # the distinct unknown edge-key count so operators can distinguish
    # "one new channel added upstream" from data corruption.
    guard = (
        "coalesce(cast(assert_true(_unknown = 0, concat("
        "'events_markov_attribution: ', cast(_unknown AS STRING), "
        "' transition edge key(s) involve an event_type outside the "
        "modeled chain states — extend _MK_CHANNELS "
        "(plans/queries_geo.py) for a legitimately new channel')) "
        "AS DOUBLE), 0.0D)"
    )
    fin = mats.selectExpr(
        f"{absorbed('full')} + {guard} AS pf",
        *[f"{absorbed(c)} AS pc_{c}" for c in _MK_CHANNELS],
    )
    per_channel = fin.select(
        "pf",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("channel"),
                        F.col(f"pc_{c}").alias("pc"),
                    )
                    for c in _MK_CHANNELS
                ]
            )
        ).alias("x"),
    ).select(
        F.col("x.channel").alias("channel"),
        # try_divide: a zero-conversion corpus has pf = 0; the oracle's
        # scalar-subquery pf is NULL there and its division yields NULL
        # rows — match that instead of raising ANSI DIVIDE_BY_ZERO
        F.round(1000000 * (1 - F.try_divide(F.col("x.pc"), F.col("pf"))))
        .cast("long")
        .alias("re_s"),
        "pf",
    )
    return per_channel.select(
        "channel",
        F.round(F.col("re_s") / 1000000.0, 6).alias("removal_effect"),
        F.round(
            F.col("re_s")
            / F.sum("re_s").over(Window.partitionBy()).cast("double"),
            6,
        ).alias("attribution_share"),
        F.round("pf", 6).alias("p_conversion"),
    ).orderBy("channel")
