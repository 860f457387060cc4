"""As-of / range join operator tests with hand-checked fixtures."""

from datetime import datetime

from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.relational import asof_join, range_join


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00"), (2, "2024-01-01 11:00:00"), (3, "2024-01-01 09:59:59")],
        "id long, t string",
    ).select("id", F.to_timestamp("t").alias("t"))
    right = spark.createDataFrame(
        [("2024-01-01 10:00:00", "a"), ("2024-01-01 11:00:00", "b")],
        "tick string, tag string",
    ).select(F.to_timestamp("tick").alias("tick"), "tag")

    out = {r["id"]: (r["tag"], r["asof_time"]) for r in
           asof_join(left, right, "t", "tick").collect()}
    assert out[1] == ("a", datetime(2024, 1, 1, 10, 0))
    assert out[2] == ("b", datetime(2024, 1, 1, 11, 0))  # equal time matches
    assert out[3] == (None, None)  # nothing at or before


def test_asof_join_with_by_keys(spark):
    left = spark.createDataFrame(
        [("u1", "2024-01-01 10:30:00"), ("u2", "2024-01-01 10:30:00")],
        "user string, t string",
    ).select("user", F.to_timestamp("t").alias("t"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", 1.0), ("u2", "2024-01-01 10:15:00", 2.0)],
        "user string, tick string, px double",
    ).select("user", F.to_timestamp("tick").alias("tick"), "px")
    out = {r["user"]: r["px"] for r in
           asof_join(left, right, "t", "tick", by=("user",)).collect()}
    assert out == {"u1": 1.0, "u2": 2.0}


def test_asof_join_carries_across_bucket_boundary(spark):
    """A left row whose time bucket holds no right row must still see
    the latest right row from an EARLIER bucket (the carry seed), and a
    left row before any right row stays unmatched."""
    left = spark.createDataFrame(
        [(1, "2024-01-05 00:10:00"),   # 4 days after the only tick
         (2, "2024-01-01 08:00:00"),   # same bucket as the tick
         (3, "2023-12-30 00:00:00")],  # before every tick
        "id long, t string",
    ).select("id", F.to_timestamp("t").alias("t"))
    right = spark.createDataFrame(
        [("2024-01-01 06:00:00", "x"), ("2024-01-01 07:00:00", "y")],
        "tick string, tag string",
    ).select(F.to_timestamp("tick").alias("tick"), "tag")

    out = {r["id"]: (r["tag"], r["asof_time"]) for r in
           asof_join(left, right, "t", "tick", bucket_minutes=1440).collect()}
    assert out[1] == ("y", datetime(2024, 1, 1, 7, 0))
    assert out[2] == ("y", datetime(2024, 1, 1, 7, 0))
    assert out[3] == (None, None)


def test_asof_join_null_value_columns_not_blended(spark):
    """A right row with a NULL value column must be carried as-is, not
    back-filled from an older right row (struct carry, not per-column)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], "id long, t string"
    ).select("id", F.to_timestamp("t").alias("t"))
    right = spark.createDataFrame(
        [("2024-01-01 10:00:00", "old", 5.0),
         ("2024-01-01 11:00:00", "new", None)],
        "tick string, tag string, px double",
    ).select(F.to_timestamp("tick").alias("tick"), "tag", "px")
    row = asof_join(left, right, "t", "tick").collect()[0]
    assert row["tag"] == "new" and row["px"] is None


def test_range_join_buckets(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-01-01 01:30:00"), (3, "2024-01-01 01:45:00")],
        "id long, t string",
    ).select("id", F.to_timestamp("t").alias("t"))
    buckets = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
         ("2024-01-01 01:00:00", "2024-01-01 02:00:00")],
        "s string, e string",
    ).select(F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))
    out = range_join(events, buckets, (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts[datetime(2024, 1, 1, 0)] == 1
    assert counts[datetime(2024, 1, 1, 1)] == 2


def test_scd2_versions_are_contiguous_and_collapse_runs(spark):
    from data_pipeline_001_spark.operators.relational import scd2_from_changelog

    log = spark.createDataFrame(
        [   # key, ts, seq, attr — runs: A,A -> B -> B,A? no: A A B B A
            (1, "2024-01-01", 1, "A"),
            (1, "2024-01-02", 2, "A"),
            (1, "2024-01-03", 3, "B"),
            (1, "2024-01-04", 4, "B"),
            (1, "2024-01-05", 5, "A"),
            (2, "2024-01-01", 6, None),
            (2, "2024-01-02", 7, "X"),
        ],
        "k long, ts string, seq long, attr string",
    ).select("k", F.to_date("ts").alias("ts"), "seq", "attr")
    out = scd2_from_changelog(
        log, ("k",), "ts", ("attr",), seq_col="seq"
    ).orderBy("k", "valid_from").collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    # runs collapsed: key 1 has A,B,A; key 2 has None,X (null-safe change)
    assert [r["attr"] for r in by_key[1]] == ["A", "B", "A"]
    assert [r["attr"] for r in by_key[2]] == [None, "X"]
    for rows in by_key.values():
        # intervals chain: each valid_to is the next valid_from; one open tail
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"] and not a["is_current"]
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None


def test_zorder_layout_tightens_file_bounding_boxes(spark, tmp_path):
    """Write the same data z-ordered vs hash-scattered; per-file
    (a, b) bounding boxes must be dramatically tighter under z-order —
    the property that makes parquet min/max stats prune on BOTH
    filter dimensions."""
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.relational import zorder_layout, zvalue

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 256).alias("a"),
        (F.col("id") * 40503 % 24).alias("b"),
    )
    zp = str(tmp_path / "z")
    rp = str(tmp_path / "r")
    zorder_layout(df, F.col("a"), F.col("b"), target_files=8).write.parquet(zp)
    df.repartition(8).write.parquet(rp)

    def avg_box_area(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("a") - F.min("a") + 1).alias("da"),
                (F.max("b") - F.min("b") + 1).alias("db"),
            )
            .select(F.avg(F.col("da") * F.col("db")).alias("area"))
            .collect()
        )
        return per_file[0]["area"]

    z_area, r_area = avg_box_area(zp), avg_box_area(rp)
    # random layout: every file spans ~the full 256x24 space; z-order
    # files cover a small fraction of it
    assert z_area < r_area / 3, (z_area, r_area)

    # zvalue must be monotone-decodable: distinct inputs, distinct z
    zs = df.select(zvalue(F.col("a"), F.col("b")).alias("z"), "a", "b").distinct()
    assert zs.count() == zs.select("z").distinct().count()


def test_recursive_cte_bfs_depth(spark):
    """Native WITH RECURSIVE walks a planted 60-node chain: min-hops
    from node 0 grows linearly until the hop bound cuts off — depth
    (driver iterations), not data volume, drives the recursion."""
    spark.range(0, 59).selectExpr(
        "id AS src", "id + 1 AS dst"
    ).createOrReplaceTempView("chain_edges")
    out = spark.sql(
        """
        WITH RECURSIVE hops (src, dst, k) AS (
          SELECT src, dst, 1 AS k FROM chain_edges
          UNION ALL
          SELECT h.src, e.dst, h.k + 1
          FROM hops h JOIN chain_edges e ON h.dst = e.src
          WHERE h.k < 30
        )
        SELECT dst, MIN(k) AS min_hops FROM hops
        WHERE src = 0 GROUP BY dst
        """
    ).collect()
    got = {r.dst: r.min_hops for r in out}
    assert got == {i: i for i in range(1, 31)}  # bound caps at 30 hops


def test_asof_broadcast_fast_path_matches_window_path(spark):
    """The tiny-right broadcast fast path returns exactly what the
    union+window path returns (incl. left rows before the first tick
    → NULL), and its plan has no Exchange."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.relational import asof_join

    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, base + timedelta(minutes=17 * i - 60)) for i in range(200)],
        "id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(base + timedelta(hours=h), h * 10) for h in range(0, 48, 7)],
        "tick timestamp, level int",
    )
    fast = asof_join(left, right, "ts", "tick")
    slow = asof_join(
        left, right, "ts", "tick", broadcast_threshold=None
    )
    fr = {r.id: (r.level, r.asof_time) for r in fast.collect()}
    sr = {r.id: (r.level, r.asof_time) for r in slow.collect()}
    assert fr == sr
    assert any(v == (None, None) for v in fr.values())  # pre-first-tick
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
