"""W1..W5 transform tests against the FIXTURES.md scenarios: gap day,
overlap pair, duplicate resolution rule order, pending selection."""

from datetime import datetime

from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.windows import (
    check_continuity,
    detect_gaps,
    detect_overlaps,
    resolve_duplicates,
    select_pending,
)


def _windows(spark, rows):
    return spark.createDataFrame(
        [(datetime.fromisoformat(s), datetime.fromisoformat(e)) for s, e in rows],
        "window_start timestamp, window_end timestamp",
    ).withColumn("window_day", F.to_date("window_start"))


def test_gap_detection_interior_and_edges(spark):
    # windows 00-10h and 12-24h: interior gap 10:00-12:00
    rows = [(f"2024-05-01 {h:02d}:00:00", f"2024-05-01 {h + 1:02d}:00:00")
            for h in list(range(0, 10)) + list(range(12, 23))]
    rows.append(("2024-05-01 23:00:00", "2024-05-02 00:00:00"))
    gaps = detect_gaps(_windows(spark, rows), day_bounds=False).collect()
    assert len(gaps) == 1
    assert gaps[0]["gap_start"] == datetime(2024, 5, 1, 10)
    assert gaps[0]["gap_end"] == datetime(2024, 5, 1, 12)
    # with day bounds: drop first window → leading edge gap appears
    gaps2 = detect_gaps(_windows(spark, rows[1:]), day_bounds=True).collect()
    starts = {(g["gap_start"], g["gap_end"]) for g in gaps2}
    assert (datetime(2024, 5, 1, 0), datetime(2024, 5, 1, 1)) in starts


def test_overlap_detection(spark):
    rows = [
        ("2024-05-01 00:00:00", "2024-05-01 01:00:00"),
        ("2024-05-01 00:30:00", "2024-05-01 01:30:00"),  # overlaps previous
        ("2024-05-01 02:00:00", "2024-05-01 03:00:00"),
    ]
    ov = detect_overlaps(_windows(spark, rows)).collect()
    assert len(ov) == 1
    assert ov[0]["first_end"] == datetime(2024, 5, 1, 1)
    assert ov[0]["second_start"] == datetime(2024, 5, 1, 0, 30)


def test_continuity_check(spark):
    rows = [
        ("2024-05-01 00:00:00", "2024-05-01 01:00:00"),
        ("2024-05-01 01:00:00", "2024-05-01 02:00:00"),
        ("2024-05-01 03:00:00", "2024-05-01 04:00:00"),  # 02-03 missing
    ]
    missing = check_continuity(_windows(spark, rows)).collect()
    assert len(missing) == 1
    assert missing[0]["missing_start"] == datetime(2024, 5, 1, 2)
    assert missing[0]["missing_end"] == datetime(2024, 5, 1, 3)


def test_duplicate_resolution_rule_order(spark):
    """The 4-level chain (state_manager.py:937-982): completed beats
    non-completed; then latest updated; then latest started; then
    OLDEST inserted (inverted final key)."""
    t0, t1, t2 = (datetime(2024, 1, 1, h) for h in (0, 1, 2))
    rows = [
        # key A: completed (id=a2) must beat in_progress with newer times
        ("a1", "k1", "in_progress", t2, t2, t2),
        ("a2", "k1", "completed", t0, t0, t0),
        # key B: both completed → latest updated wins (b2)
        ("b1", "k2", "completed", t0, t1, t1),
        ("b2", "k2", "completed", t1, t1, t1),
        # key C: tie on status+updated+started → OLDEST inserted wins (c1)
        ("c1", "k3", "completed", t1, t1, t0),
        ("c2", "k3", "completed", t1, t1, t2),
    ]
    df = spark.createDataFrame(
        rows,
        "unique_source_id string, key string, pipeline_status string, "
        "record_last_updated_time timestamp, pipeline_start_time timestamp, "
        "record_first_inserted_time timestamp",
    )
    kept = {
        r["unique_source_id"]
        for r in resolve_duplicates(df, key_cols=("key",)).where("_keep").collect()
    }
    assert kept == {"a2", "b2", "c1"}


def test_select_pending_order(spark):
    t = datetime(2024, 1, 1)
    rows = [
        ("r1", "pending", datetime(2024, 1, 1, 5), 0, 1.0),
        ("r2", "pending", datetime(2024, 1, 1, 3), 0, 1.0),   # oldest window → first
        ("r3", "pending", datetime(2024, 1, 1, 3), 2, 1.0),   # same window, more retries → before r2
        ("r4", "in_progress", datetime(2024, 1, 1, 1), 0, 1.0),  # not pending
    ]
    df = spark.createDataFrame(
        rows,
        "id string, pipeline_status string, source_query_window_start_time timestamp, "
        "pipeline_retry_count int, pipeline_priority double",
    )
    out = [r["id"] for r in select_pending(df, limit=2).collect()]
    assert out == ["r3", "r2"]


def test_approx_quartiles_agree_with_exact_ntile(spark):
    """The 2-pass approx-percentile quartile path must agree with exact
    global NTILE on nearly every row (disagreement only at boundary
    ties / group-size rounding)."""
    from data_pipeline_001_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = {
        r["c_custkey"]: r["quartile"]
        for r in REGISTRY["window_ntile_customer_quartiles"](spark, sf).collect()
    }
    approx = {
        r["c_custkey"]: r["quartile"]
        for r in REGISTRY["window_quartiles_approx"](spark, sf).collect()
    }
    assert exact.keys() == approx.keys()
    agree = sum(1 for k in exact if exact[k] == approx[k]) / len(exact)
    assert agree >= 0.9, f"approx quartiles agree on only {agree:.1%}"
    # every quartile present and roughly balanced (within 2x of n/4)
    from collections import Counter

    sizes = Counter(approx.values())
    n = len(approx)
    assert set(sizes) == {1, 2, 3, 4}
    for q in (1, 2, 3, 4):
        assert sizes[q] <= n / 2


def test_salted_topk_equals_plain_topk(spark):
    """The two-phase salted top-k must return exactly the same rows as
    the single-window form — salting only changes the plan shape."""
    from data_pipeline_001_spark.operators.windows import (
        top_k_per_group,
        top_k_per_group_salted,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    order = [F.col("h").asc(), F.col("doc_id").asc()]
    plain = top_k_per_group(docs, ("lang",), order, k=7)
    salted = top_k_per_group_salted(
        docs, ("lang",), order, k=7, salt_on=F.col("doc_id"), n_salts=5
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
