"""F9..F13 scalar function tests: hash determinism vs hashlib, guard
clauses, curve floors (SURVEY.md §5.1)."""

import hashlib

from pyspark.sql import functions as F

from data_pipeline_001_spark.functions.hash_fns import (
    composite_md5_id,
    minutes_to_granularity,
    percentage_difference,
    scaled_duration_estimate,
    sha256_record_hash,
)


def test_composite_md5_matches_hashlib(spark):
    df = spark.createDataFrame([("p1", "2024-01-01 00:00:00")], "name string, start string")
    got = df.select(
        composite_md5_id({"pipeline": F.col("name"), "start": F.col("start")}).alias("h")
    ).first()["h"]
    expected = hashlib.md5(b"pipeline:p1_start:2024-01-01 00:00:00").hexdigest()
    assert got == expected


def test_sha256_record_hash(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    got = df.select(sha256_record_hash(F.col("a"), F.col("b")).alias("h")).first()["h"]
    assert got == hashlib.sha256(b"1|x").hexdigest()


def test_minutes_to_granularity(spark):
    df = spark.createDataFrame([(1440,), (90,), (45,), (2880,), (0,)], "m int")
    got = [r["g"] for r in df.select(minutes_to_granularity(F.col("m")).alias("g")).collect()]
    assert got == ["1d", "1h30m", "45m", "2d", "0m"]


def test_percentage_difference_guards(spark):
    # audit_manager.py:385-392: 0/0 → 0, source 0 → 100
    df = spark.createDataFrame([(0, 0), (0, 5), (100, 99), (100, 101)], "s long, t long")
    got = [
        r["p"]
        for r in df.select(
            percentage_difference(F.col("s"), F.col("t")).alias("p")
        ).collect()
    ]
    assert got == [0.0, 100.0, -1.0, 1.0]


def test_scaling_curve_floor_and_skew(spark):
    # ratio < 1 → floored at base; ×1.5 skew (source_discovery_manager.py:186-271)
    df = spark.createDataFrame([(100,), (600,)], "cnt long")
    got = [
        r["e"]
        for r in df.select(
            scaled_duration_estimate(F.col("cnt"), 300, 10, "linear").alias("e")
        ).collect()
    ]
    assert got[0] == 15.0          # floor: max(10*100/300, 10)*1.5
    assert abs(got[1] - 30.0) < 1e-9   # 10*2*1.5


def test_json_int_fast_matches_full_parser(spark):
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.functions.json_fns import (
        json_double_fast,
        json_int_fast,
    )

    rows = [
        ('{"k": 76}',),
        ('{"k":-5}',),
        ('{"k": 12.5}',),          # non-int → fast path must fall back
        ('{"k": "42"}',),          # quoted → fallback (full parser: 42)
        ('{"other": 1}',),         # absent → null
        ('{"k": 1, "j": 2}',),
        (None,),
        ('not json at all',),
        # nested-object false-positive class (ADVICE r2): the regex
        # alone would match the INNER "k": 5 — the flatness guard must
        # route these to the full parser, which answers from $.k only
        ('{"a": {"k": 5}, "k": 7}',),
        ('{"a": {"k": 5}}',),          # only nested k → $.k is null
        ('{"arr": [1, 2], "k": 9}',),  # array present → fallback
        ('{"k": 3, "b": {"c": 1}}',),  # nested after the key → fallback
    ]
    df = spark.createDataFrame(rows, "props string")
    got = df.select(
        json_int_fast("props", "k").alias("fast"),
        F.get_json_object("props", "$.k").try_cast("int").alias("slow"),
        json_double_fast("props", "k").alias("fast_d"),
        F.get_json_object("props", "$.k").try_cast("double").alias("slow_d"),
    ).collect()
    for r in got:
        assert r["fast"] == r["slow"], r
        assert r["fast_d"] == r["slow_d"], r


def test_json_fast_rejects_non_identifier_key(spark):
    import pytest

    from data_pipeline_001_spark.functions.json_fns import json_int_fast

    with pytest.raises(ValueError):
        json_int_fast("props", 'k"]; drop')


def test_json_int_fast_overflow_returns_null_both_paths(spark):
    """ADVICE fix: fast path must try_cast like the fallback, so an
    int-overflowing value yields NULL on both doc shapes (flat doc
    takes the regexp fast path, nested doc the full-parser fallback)."""
    from data_pipeline_001_spark.functions.json_fns import json_int_fast

    df = spark.createDataFrame(
        [
            (1, '{"k": 99999999999999999999}'),          # flat -> fast path
            (2, '{"k": 99999999999999999999, "o": {}}'),  # nested -> fallback
            (3, '{"k": 7}'),
        ],
        "id long, props string",
    )
    rows = {
        r["id"]: r["v"]
        for r in df.select(
            "id", json_int_fast("props", "k").alias("v")
        ).collect()
    }
    assert rows[1] is None and rows[2] is None and rows[3] == 7
