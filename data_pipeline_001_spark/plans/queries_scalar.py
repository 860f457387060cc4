"""Scalar-function and time-kernel query surface (SURVEY.md §2.8,
§2.10): window spines, floor/ceil/round, tumbling aggregation, safe
boundary, JSON extraction, hash ids, math curves, granularity strings.
Registers into the shared REGISTRY in ``plans.queries``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.plans.queries_curation2 import _NORM_SQL
from data_pipeline_001_spark.session import load_tables


@query(
    "time_spine_hourly",
    """
    SELECT range AS window_start,
           range + INTERVAL 1 HOUR AS window_end,
           CAST(60 AS INT) AS duration_minutes,
           CAST(range AS DATE) AS window_day
    FROM range(TIMESTAMP '2024-01-03 00:00:00', TIMESTAMP '2024-01-04 00:00:00',
               INTERVAL 1 HOUR)
    """,
)
def time_spine(spark, sf_dir):
    """F1: distributed tumbling-window spine (time_utils.py:178-217)."""
    from data_pipeline_001_spark.functions.time_fns import window_spine

    return window_spine(spark, "2024-01-03 00:00:00", "2024-01-04 00:00:00", "1h")


@query(
    "time_spine_dst_week",
    """
    WITH hrs AS (
      SELECT range AS ws FROM range(TIMESTAMP '2024-03-09 08:00:00',
                                    TIMESTAMP '2024-03-12 08:00:00', INTERVAL 1 HOUR)
      UNION ALL
      SELECT range AS ws FROM range(TIMESTAMP '2024-11-02 07:00:00',
                                    TIMESTAMP '2024-11-05 08:00:00', INTERVAL 1 HOUR)
    ),
    loc AS (SELECT timezone('America/Los_Angeles', timezone('UTC', ws)) AS lws
            FROM hrs)
    SELECT CAST(lws AS DATE) AS local_day,
           COUNT(*) AS n_hours,
           MIN(lws) AS first_local_hour,
           MAX(lws) AS last_local_hour
    FROM loc
    GROUP BY local_day
    HAVING local_day IN (DATE '2024-03-09', DATE '2024-03-10', DATE '2024-03-11',
                         DATE '2024-11-02', DATE '2024-11-03', DATE '2024-11-04')
    """,
)
def time_spine_dst_week(spark, sf_dir):
    """DST window math pinned against the oracle: an hourly UTC spine
    over the 2024 America/Los_Angeles transition days, rolled up per
    LOCAL day. The spring-forward day (2024-03-10) must have 23 hours
    and the fall-back day (2024-11-03) 25 — wall-clock day arithmetic,
    the reference's pendulum stance (time_utils.py throughout), here
    expressed with from_utc_timestamp so no session state changes.
    Every local day still runs first-hour 00:00 → last-hour 23:00."""
    from data_pipeline_001_spark.functions.time_fns import window_spine

    spring = window_spine(
        spark, "2024-03-09 08:00:00", "2024-03-12 08:00:00", "1h"
    )
    fall = window_spine(
        spark, "2024-11-02 07:00:00", "2024-11-05 08:00:00", "1h"
    )
    lws = F.from_utc_timestamp("window_start", "America/Los_Angeles")
    days = [
        "2024-03-09", "2024-03-10", "2024-03-11",
        "2024-11-02", "2024-11-03", "2024-11-04",
    ]
    return (
        spring.unionByName(fall)
        .select(lws.alias("lws"))
        .groupBy(F.to_date("lws").alias("local_day"))
        .agg(
            F.count("*").alias("n_hours"),
            F.min("lws").alias("first_local_hour"),
            F.max("lws").alias("last_local_hour"),
        )
        .where(F.col("local_day").isin(days))
    )


@query(
    "time_floor_ceil_round",
    """
    SELECT event_id,
           date_trunc('hour', ts) AS hour_floor,
           CASE WHEN date_trunc('hour', ts) = ts THEN ts
                ELSE date_trunc('hour', ts) + INTERVAL 1 HOUR END AS hour_ceil,
           CASE WHEN epoch_us(ts) - epoch_us(date_trunc('hour', ts)) >= 1800000000
                THEN date_trunc('hour', ts) + INTERVAL 1 HOUR
                ELSE date_trunc('hour', ts) END AS hour_round
    FROM events
    """,
)
def time_floor_ceil_round(spark, sf_dir):
    """F2/F3/F4: floor, ceil, midpoint-round (time_utils.py:8-139)."""
    from data_pipeline_001_spark.functions.time_fns import (
        ceil_timestamp,
        floor_timestamp,
        round_timestamp,
    )

    t = load_tables(spark, sf_dir)
    ts = F.col("ts")
    return t["events"].select(
        "event_id",
        floor_timestamp(ts, "hour").alias("hour_floor"),
        ceil_timestamp(ts, "hour").alias("hour_ceil"),
        round_timestamp(ts, "hour").alias("hour_round"),
    )


@query(
    "time_tumbling_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def time_tumbling(spark, sf_dir):
    """Tumbling-window aggregation — the batch form of the streaming
    window() group (SURVEY §2.10)."""
    t = load_tables(spark, sf_dir)
    return t["events"].groupBy(
        F.date_trunc("hour", "ts").alias("window_start")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "time_safe_boundary_filter",
    """
    SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
    FROM events
    WHERE date_trunc('hour', ts) <= TIMESTAMP '2024-01-28 00:00:00'
    GROUP BY 1
    """,
)
def time_safe_boundary(spark, sf_dir):
    """P7: anti-future safe-boundary filter (x_time_back semantics,
    main_pipeline_orchestrator.py:242-300) with proper timestamp
    comparison instead of the reference's ISO-string compare."""
    t = load_tables(spark, sf_dir)
    boundary = F.lit("2024-01-28 00:00:00").cast("timestamp")
    return (
        t["events"]
        .select(F.date_trunc("hour", "ts").alias("window_start"))
        .where(F.col("window_start") <= boundary)
        .groupBy("window_start")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "json_extract_props",
    """
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def json_extract(spark, sf_dir):
    """JSON scalar surface over the opaque document body
    (events.props). The key is extracted ONCE in a projection below
    the aggregate — referencing get_json_object inside each of
    avg/min/max re-parses the JSON string per aggregate expression
    (measured 3× the parse cost at the sf1 bench point) — and through
    the guarded regexp fast path (functions/json_fns.py), which beats
    the per-row Jackson parse 2.5× at sf1 while falling back to the
    full parser on any row the regex can't read."""
    from data_pipeline_001_spark.functions.json_fns import json_int_fast

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "event_type", json_int_fast("props", "k").alias("k")
    )
    return ev.groupBy("event_type").agg(
        F.round(F.avg("k"), 6).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("*").alias("cnt"),
    )


@query(
    "json_from_struct",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           (CAST(json_extract_string(props, '$.k') AS INT) > 50) AS k_high
    FROM events WHERE event_id < 3000
    """,
)
def json_from_struct(spark, sf_dir):
    """from_json → typed struct column (schema-on-read over the opaque
    document body), then struct field access."""
    t = load_tables(spark, sf_dir)
    parsed = F.from_json("props", "k INT")
    return (
        t["events"]
        .where(F.col("event_id") < 3000)
        .withColumn("p", parsed)
        .select(
            "event_id",
            F.col("p.k").alias("k_val"),
            (F.col("p.k") > 50).alias("k_high"),
        )
    )


@query(
    "hash_composite_ids",
    """
    SELECT o_orderkey,
           md5(concat_ws('_', 'cust:' || CAST(o_custkey AS VARCHAR),
                              'order:' || CAST(o_orderkey AS VARCHAR))) AS unique_source_id,
           sha256(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus)) AS record_hash
    FROM orders WHERE o_orderkey < 500
    """,
)
def hash_ids(spark, sf_dir):
    """F9/F10: deterministic MD5 composite ids + SHA-256 record hashes
    (state_manager.py:419-484, utils/hash_id_generation.py:4-7)."""
    from data_pipeline_001_spark.functions.hash_fns import (
        composite_md5_id,
        sha256_record_hash,
    )

    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .where(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            composite_md5_id(
                {"cust": F.col("o_custkey"), "order": F.col("o_orderkey")}
            ).alias("unique_source_id"),
            sha256_record_hash(F.col("o_orderkey"), F.col("o_orderstatus")).alias(
                "record_hash"
            ),
        )
    )


@query(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           SUBSTR(p_name, 1, 10) AS name_prefix,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           REPLACE(p_type, ' ', '_') AS type_slug,
           (p_name LIKE '%a%') AS has_a
    FROM part
    """,
)
def scalar_strings(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@query(
    "scalar_duration_curves",
    """
    WITH g AS (SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY 1)
    SELECT o_orderpriority, cnt,
           ROUND(GREATEST(10.0 * (cnt / 300.0), 10.0) * 1.5, 6)            AS est_linear,
           ROUND(GREATEST(10.0 * (1 + LN(1 + cnt / 300.0)), 10.0) * 1.5, 6) AS est_log,
           ROUND(GREATEST(10.0 * SQRT(cnt / 300.0), 10.0) * 1.5, 6)         AS est_sqrt,
           ROUND(GREATEST(10.0 * POW(cnt / 300.0, 0.6), 10.0) * 1.5, 6)     AS est_power
    FROM g
    """,
)
def scalar_curves(spark, sf_dir):
    """F12: the reference's duration-estimate scaling curves
    (source_discovery_manager.py:186-271) as column expressions."""
    from data_pipeline_001_spark.functions.hash_fns import scaled_duration_estimate

    t = load_tables(spark, sf_dir)
    g = t["orders"].groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))
    c = F.col("cnt")
    return g.select(
        "o_orderpriority",
        "cnt",
        F.round(scaled_duration_estimate(c, 300, 10, "linear"), 6).alias("est_linear"),
        F.round(scaled_duration_estimate(c, 300, 10, "log"), 6).alias("est_log"),
        F.round(scaled_duration_estimate(c, 300, 10, "sqrt"), 6).alias("est_sqrt"),
        F.round(scaled_duration_estimate(c, 300, 10, "power"), 6).alias("est_power"),
    )


@query(
    "scalar_granularity_string",
    """
    SELECT minutes,
           (CASE WHEN minutes // 1440 > 0 THEN (minutes // 1440) || 'd' ELSE '' END)
        || (CASE WHEN (minutes % 1440) // 60 > 0 THEN ((minutes % 1440) // 60) || 'h' ELSE '' END)
        || (CASE WHEN minutes % 60 > 0 OR minutes // 60 = 0 THEN (minutes % 60) || 'm' ELSE '' END)
           AS granularity
    FROM (SELECT DISTINCT CAST(o_orderkey % 3000 + 1 AS INT) AS minutes FROM orders)
    """,
)
def scalar_granularity(spark, sf_dir):
    """F11: minutes → '2d', '1h30m', '45m' (state_manager.py:1139-1152)."""
    from data_pipeline_001_spark.functions.hash_fns import minutes_to_granularity

    t = load_tables(spark, sf_dir)
    m = t["orders"].select(
        (F.col("o_orderkey") % 3000 + 1).cast("int").alias("minutes")
    ).distinct()
    return m.select("minutes", minutes_to_granularity(F.col("minutes")).alias("granularity"))


@query(
    "scalar_regexp_extract",
    """
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
           regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
           regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel
    FROM part
    """,
)
def scalar_regexp(spark, sf_dir):
    """Regex group extraction + boolean match (same RE syntax both
    engines for this class of pattern)."""
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        (F.regexp_count("p_name", F.lit(r"[aeiou]{2}")) > 0).alias("has_double_vowel"),
    )


@query(
    "scalar_least_greatest",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(LEAST(l_extendedprice, 2000.0), 2) AS capped_price,
           ROUND(GREATEST(l_discount, l_tax), 6) AS max_rate,
           CAST(ABS(l_quantity - 25) AS INT) AS qty_dev,
           ROUND(POWER(l_quantity, 0.5) + LN(1 + l_extendedprice), 6) AS mixed_math
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def scalar_least_greatest(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.least("l_extendedprice", F.lit(2000.0)), 2).alias("capped_price"),
            F.round(F.greatest("l_discount", "l_tax"), 6).alias("max_rate"),
            F.abs(F.col("l_quantity") - 25).cast("int").alias("qty_dev"),
            F.round(
                F.pow("l_quantity", F.lit(0.5)) + F.log1p("l_extendedprice"), 6
            ).alias("mixed_math"),
        )
    )


@query(
    "array_ops_text_tokens",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
           array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\\s+')))[1:3], '|')
               AS first3_sorted,
           list_contains(string_split_regex(trim(text), '\\s+'), 'data') AS has_data
    FROM documents WHERE doc_id < 100
    """,
)
def array_ops(spark, sf_dir):
    """Array surface: size / sort / distinct / slice / contains /
    join over tokenized text."""
    t = load_tables(spark, sf_dir)
    toks = F.split(F.trim("text"), r"\s+")
    return (
        t["documents"]
        .where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.array_join(
                F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), "|"
            ).alias("first3_sorted"),
            F.array_contains(toks, "data").alias("has_data"),
        )
    )


@query(
    "filter_predicate_stack",
    """
    SELECT event_id, ts, user_id, value FROM events
    WHERE user_id IS NOT NULL
      AND event_type = 'purchase'
      AND value > 50.0
      AND ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-25 00:00:00'
    """,
)
def filter_stack(spark, sf_dir):
    """P1+P2+P3+P6 predicate stack — all pushed to the parquet scan
    (verify with .explain: PushedFilters)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .where(F.col("event_type") == "purchase")
        .where(F.col("value") > 50.0)
        .where(
            (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-25 00:00:00").cast("timestamp"))
        )
        .select("event_id", "ts", "user_id", "value")
    )


@query(
    "derived_projection_window_day",
    """
    SELECT event_id,
           CAST(ts AS DATE) AS window_day,
           CAST((epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR)
                 - epoch_us(date_trunc('hour', ts))) / 60000000 AS INT) AS duration_minutes
    FROM events WHERE event_id < 200
    """,
)
def derived_projection(spark, sf_dir):
    """P8: per-row derived projection — day + duration columns
    (state_manager.py:548-549, time_utils.py:221-231)."""
    from data_pipeline_001_spark.functions.time_fns import window_duration_minutes

    t = load_tables(spark, sf_dir)
    start = F.date_trunc("hour", "ts")
    end = start + F.expr("interval 1 hour")
    return (
        t["events"]
        .where(F.col("event_id") < 200)
        .select(
            "event_id",
            F.to_date("ts").alias("window_day"),
            window_duration_minutes(start, end).alias("duration_minutes"),
        )
    )


@query(
    "json_variant_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing
    FROM events WHERE event_id < 3000
    """,
)
def json_variant_extract(spark, sf_dir):
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` encodes
    the document once into the binary variant form, then typed field
    reads via ``try_variant_get`` — the open-schema twin of the fixed
    ``from_json`` struct in json_from_struct. Missing keys read as
    NULL (try_ semantics), matching SQL JSON-path extraction. At scale
    this is the shape for ingesting heterogeneous JSON without a
    declared schema: one parse, shredded typed access."""
    t = load_tables(spark, sf_dir)
    v = F.parse_json("props")
    return (
        t["events"]
        .where(F.col("event_id") < 3000)
        .withColumn("v", v)
        .select(
            "event_id",
            F.try_variant_get("v", "$.k", "int").alias("k_val"),
            F.try_variant_get("v", "$.missing", "int").alias("k_missing"),
        )
    )


@query(
    "scalar_bitwise_ops",
    """
    SELECT event_id,
           CAST(user_id & 255 AS BIGINT)  AS masked,
           CAST(user_id | 4096 AS BIGINT) AS flagged,
           CAST(xor(user_id, event_id) AS BIGINT) AS mixed,
           CAST(user_id << 2 AS BIGINT)   AS shifted_l,
           CAST(user_id >> 3 AS BIGINT)   AS shifted_r,
           CAST(bit_count(user_id) AS INT) AS popcount
    FROM events WHERE user_id IS NOT NULL AND event_id < 3000
    """,
)
def bitwise_ops_q(spark, sf_dir):
    """Bitwise scalar surface: mask/flag/xor/shifts/popcount — the
    primitives under bitmap indexes, bloom hashing, and the engine's
    own Z-order interleave, exercised directly."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("user_id").isNotNull() & (F.col("event_id") < 3000))
        .select(
            "event_id",
            F.expr("user_id & 255").cast("long").alias("masked"),
            F.expr("user_id | 4096").cast("long").alias("flagged"),
            F.expr("user_id ^ event_id").cast("long").alias("mixed"),
            F.expr("shiftleft(user_id, 2)").cast("long").alias("shifted_l"),
            F.expr("shiftright(user_id, 3)").cast("long").alias("shifted_r"),
            F.bit_count("user_id").cast("int").alias("popcount"),
        )
    )


@query(
    "array_set_ops",
    f"""
    WITH t AS (SELECT doc_id,
                      string_split({_NORM_SQL}, ' ') AS w
               FROM documents WHERE doc_id < 200),
    ab AS (SELECT doc_id, w[1:10] AS a, w[-10:] AS b FROM t)
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(list_cat(a, b))), ',')
               AS union_str,
           CAST(len(list_distinct(list_intersect(a, b))) AS INT)
               AS inter_size,
           CAST(len(list_distinct(list_filter(a, x -> NOT list_contains(b, x))))
               AS INT) AS except_size
    FROM ab
    """,
)
def array_set_ops_q(spark, sf_dir):
    """Array set algebra (union/intersect/except) over the first and
    last 10 tokens of each document — the set primitives behind
    shingle overlap and tag reconciliation, emitted as a sorted joined
    string + sizes so both engines compare canonically."""
    from data_pipeline_001_spark.functions.text import normalize_text

    t = load_tables(spark, sf_dir)
    w = F.split(normalize_text(F.col("text")), " ")
    ab = (
        t["documents"]
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.slice(w, 1, 10).alias("a"),
            F.slice(w, -10, 10).alias("b"),
        )
    )
    return ab.select(
        "doc_id",
        F.array_join(
            F.sort_array(F.array_distinct(F.concat("a", "b"))), ","
        ).alias("union_str"),
        F.size(F.array_distinct(F.array_intersect("a", "b")))
        .cast("int")
        .alias("inter_size"),
        F.size(F.array_distinct(F.array_except("a", "b")))
        .cast("int")
        .alias("except_size"),
    )


@query(
    "time_business_day_lag",
    """
    WITH j AS (SELECT l.l_orderkey, l.l_linenumber,
                      date_diff('day', DATE '1970-01-01',
                                CAST(o.o_orderdate AS DATE)) AS e0,
                      date_diff('day', DATE '1970-01-01',
                                CAST(l.l_shipdate AS DATE)) AS e1
               FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
               WHERE l.l_orderkey < 2000)
    SELECT l_orderkey, l_linenumber,
           CAST(e1 - e0 AS BIGINT) AS calendar_days,
           CAST((e1 - e0)
                - (FLOOR((e1 - 2) / 7.0) - FLOOR((e0 - 2) / 7.0))
                - (FLOOR((e1 - 3) / 7.0) - FLOOR((e0 - 3) / 7.0))
                AS BIGINT) AS business_days
    FROM j
    """,
)
def business_day_lag_q(spark, sf_dir):
    """Order→ship lag in BUSINESS days: weekends subtracted with the
    closed-form Saturday/Sunday counters (epoch-day anchors — day 2 =
    1970-01-03, a Saturday — so no engine-specific day-of-week
    numbering is ever consulted; Spark's dayofweek is 1=Sunday,
    DuckDB's is 0=Sunday, a classic cross-engine trap this formula
    sidesteps). Pure integer/floor arithmetic pushed through the
    join projection."""
    t = load_tables(spark, sf_dir)
    e = lambda c: F.datediff(F.col(c).cast("date"), F.lit("1970-01-01").cast("date"))  # noqa: E731
    j = (
        t["lineitem"]
        .where(F.col("l_orderkey") < 2000)
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            e("o_orderdate").alias("e0"),
            e("l_shipdate").alias("e1"),
        )
    )
    sat = lambda col: F.floor((F.col(col) - 2) / 7.0)  # noqa: E731
    sun = lambda col: F.floor((F.col(col) - 3) / 7.0)  # noqa: E731
    return j.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("e1") - F.col("e0")).cast("long").alias("calendar_days"),
        (
            (F.col("e1") - F.col("e0"))
            - (sat("e1") - sat("e0"))
            - (sun("e1") - sun("e0"))
        )
        .cast("long")
        .alias("business_days"),
    )


@query(
    "time_month_arithmetic",
    """
    WITH anchors AS (SELECT CAST(a AS DATE) AS d
                     FROM (VALUES ('2024-01-31'), ('2024-01-30'),
                                  ('2024-02-29'), ('2023-02-28'),
                                  ('2024-03-31'), ('2024-04-15'),
                                  ('2024-12-31')) v(a))
    SELECT d,
           CAST(d + INTERVAL 1 MONTH AS DATE)  AS plus_1m,
           CAST(d + INTERVAL 13 MONTH AS DATE) AS plus_13m,
           CAST(d - INTERVAL 1 MONTH AS DATE)  AS minus_1m,
           CAST(date_trunc('month', d) AS DATE) AS month_start,
           last_day(d) AS month_end,
           CAST(date_diff('day', CAST(date_trunc('month', d) AS DATE),
                          last_day(d)) + 1 AS INT) AS days_in_month
    FROM anchors
    """,
)
def month_arithmetic_q(spark, sf_dir):
    """Calendar month arithmetic on the boundary cases that break
    naive implementations: month-end clamping (Jan 31 + 1 month =
    Feb 29 in a leap year — BOTH engines clamp, asserted by the hash
    gate), leap-day handling, year rollover, month length. These are
    the semantics the monthly rollup grain and billing-cycle windows
    sit on; a divergence here corrupts every month-grain partition
    silently."""
    load_tables(spark, sf_dir)
    anchors = spark.createDataFrame(
        [("2024-01-31",), ("2024-01-30",), ("2024-02-29",),
         ("2023-02-28",), ("2024-03-31",), ("2024-04-15",),
         ("2024-12-31",)],
        ["a"],
    ).select(F.col("a").cast("date").alias("d"))
    return anchors.select(
        "d",
        F.add_months("d", 1).alias("plus_1m"),
        F.add_months("d", 13).alias("plus_13m"),
        F.add_months("d", -1).alias("minus_1m"),
        F.date_trunc("month", "d").cast("date").alias("month_start"),
        F.last_day("d").alias("month_end"),
        (
            F.datediff(F.last_day("d"), F.date_trunc("month", "d").cast("date"))
            + 1
        )
        .cast("int")
        .alias("days_in_month"),
    )
