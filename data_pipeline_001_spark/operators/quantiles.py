"""Distributed EXACT quantiles by rank selection (round-11).

Spark's built-in exact ``percentile`` aggregate is an
ObjectHashAggregate: every partial buffer is an OpenHashMap of
value→count, the final merge is single-threaded, and with millions of
mostly-distinct doubles the map build + merge dominates (measured
10.4 s for one median over 2.9M slopes at sf1 — 70% of the whole
stats_theil_sen query).

The classic selection alternative runs entirely in codegen operators:

1. ``repartitionByRange`` on the value — ONE range exchange of the
   bare (value) column; partition ids are ascending value ranges, so
   the concatenation of sorted partitions is the sorted multiset.
2. per-partition ``row_number`` (partition-local sort, no further
   exchange of the data beyond the window's hash-by-pid pass).
3. The tiny per-partition counts (≤P rows) turn local ranks into
   global ranks; each requested quantile p needs only the rows ranked
   floor/ceil of 1 + p·(n−1), interpolated with Spark's own Percentile
   weights ((1−g)·lower + g·higher) — so the result is value-identical
   to ``percentile(col, p)``, just never built as a giant hash map.

Scale posture: the data crosses the network once (the range
exchange) plus once hashed by pid for the window; every post-window
operator touches ≤ P + 2·len(ps) rows. ``num_partitions`` defaults to
the session's parallelism, so the shape adapts to the core count
instead of hard-coding either the local or a cluster value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    out_cols: list[str],
    num_partitions: int | None = None,
    filter_nulls: bool = True,
) -> DataFrame:
    """One row: ``n`` (long, non-null count) + one exact-quantile
    column per entry of ``ps`` named by ``out_cols``.

    Value-identical to
    ``df.agg(percentile(col, p) for p in ps, count(col))`` for every
    input with ≥1 non-null row (asserted by the parity test). NULLs
    are excluded exactly like the builtin aggregate. Empty input
    returns an empty frame (the builtin would return one NULL row) —
    callers on possibly-empty data should guard.

    ``filter_nulls=False`` skips the null filter for columns the
    caller proves non-null. This matters beyond cost: the filter can
    be PUSHED INTO a join condition below ``df``, evaluating ``col``
    on candidate rows the join predicate would reject — under ANSI an
    error-throwing expression (e.g. a division whose guard IS the
    join predicate) then fails on rows that never exist in ``df``.
    """
    assert len(ps) == len(out_cols)
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism

    vals = df.select(F.col(col).alias("_v"))
    if filter_nulls:
        vals = vals.where(F.col("_v").isNotNull())
    ranked = vals.repartitionByRange(num_partitions, F.col("_v"))
    w = Window.partitionBy("_pid").orderBy("_v")
    loc = ranked.select(
        "_v", F.spark_partition_id().alias("_pid")
    ).withColumn("_rn", F.row_number().over(w))

    cnt = loc.groupBy("_pid").agg(F.count("*").alias("_c"))
    w_ofs = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ofs = cnt.select(
        "_pid",
        F.coalesce(F.sum("_c").over(w_ofs), F.lit(0)).alias("_offset"),
    )
    tot = cnt.agg(F.sum("_c").alias("n"))

    sel = (
        loc.join(F.broadcast(ofs), "_pid")
        .crossJoin(F.broadcast(tot))
        .withColumn("_grn", F.col("_offset") + F.col("_rn"))
    )
    preds = []
    aggs = []
    for p, out in zip(ps, out_cols):
        # 1-based target rank k = 1 + p·(n−1); g = k − floor(k) are
        # exactly the builtin Percentile's interpolation weights
        k = F.lit(1.0) + F.lit(float(p)) * (F.col("n").cast("double") - 1.0)
        lo, hi = F.floor(k).cast("long"), F.ceil(k).cast("long")
        g = k - F.floor(k)
        preds.append((F.col("_grn") == lo) | (F.col("_grn") == hi))
        # when lo == hi the first branch takes the row with weight
        # (1−g) = 1, so nothing is double-counted
        aggs.append(
            F.sum(
                F.when(F.col("_grn") == lo, (F.lit(1.0) - g) * F.col("_v"))
                .when(F.col("_grn") == hi, g * F.col("_v"))
                .otherwise(F.lit(0.0))
            ).alias(out)
        )
    keep = preds[0]
    for pr in preds[1:]:
        keep = keep | pr
    return sel.where(keep).groupBy("n").agg(*aggs).select("n", *out_cols)
