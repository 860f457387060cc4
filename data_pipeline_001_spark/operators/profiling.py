"""One-pass column profiler (Deequ column-profile analogue; extends
the reference's single-count audit — core/audit_manager.py — to a full
per-column statistics report).

Every requested column contributes its aggregate expressions to ONE
``agg`` over ONE scan; the wide result row is then unpivoted to the
(column, stats...) report via ``stack``. Numeric columns also report
min/max/mean; strings report lexicographic min/max.

Distinct counts: ``exact_distinct=True`` uses ``count_distinct``
per column. Round-11 (guide §1.2 step 1): fusing several
``count_distinct`` into ONE agg makes Catalyst plan an Expand that
duplicates every input row once per distinct aggregate (k columns →
a (k+1)× row blowup into the partial aggregate — measured 7.7 s at
sf1 over 6 lineitem columns). The exact mode therefore builds one
single-distinct aggregate PER column and unions the 9-field report
rows: no Expand anywhere, and each subtree's parquet scan prunes to
its one column, so total bytes read equal the fused form's single
scan (measured 2.6 s, −66%). The default ``exact_distinct=False``
(HLL ``approx_count_distinct``, rsd 1%) keeps the genuinely fused
one-pass plan: one scan, no Expand, mergeable across partitions —
still the right mode at 100 TB × many columns, where even per-column
exact distinct is a full shuffle of each column's values.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: same guard as operators.constraints — names are interpolated into
#: the stack() selectExpr, so only simple identifiers are accepted
_SIMPLE_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct,
    min_num, max_num, mean_num, min_str, max_str).

    Plan shape (round-12 doc fix, ADVICE): the HLL default is ONE
    aggregation over ONE scan. ``exact_distinct=True`` builds one
    aggregation subtree PER column unioned together — on a prunable
    columnar SCAN total bytes read still match one full-width scan
    (each subtree prunes to its own column), but on a DERIVED or
    computed input the upstream plan re-executes once per column;
    localCheckpoint/cache non-scan inputs before profiling them in
    exact mode."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or list(fields)
    for c in cols:
        if c not in fields:
            raise ValueError(f"unknown column {c!r}")
        if not _SIMPLE_NAME.match(c):
            raise ValueError(
                f"column name must match [A-Za-z_][A-Za-z0-9_]*, got {c!r}"
            )

    if exact_distinct:
        # one single-distinct aggregate per column, unioned: no Expand
        # (see module docstring), per-column parquet scans
        parts = []
        for c in cols:
            dt = fields[c]
            aggs = [
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_null"),
                F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
            ]
            if isinstance(dt, _NUMERIC):
                aggs += [
                    F.round(F.min(c).cast("double"), 6).alias("min_num"),
                    F.round(F.max(c).cast("double"), 6).alias("max_num"),
                    F.round(F.avg(F.col(c).cast("double")), 6).alias("mean_num"),
                ]
            else:
                aggs += [
                    F.lit(None).cast("double").alias("min_num"),
                    F.lit(None).cast("double").alias("max_num"),
                    F.lit(None).cast("double").alias("mean_num"),
                ]
            if isinstance(dt, T.StringType):
                aggs += [
                    F.min(c).alias("min_str"),
                    F.max(c).alias("max_str"),
                ]
            else:
                aggs += [
                    F.lit(None).cast("string").alias("min_str"),
                    F.lit(None).cast("string").alias("max_str"),
                ]
            parts.append(
                df.select(c)
                .agg(F.lit(c).alias("column"), *aggs)
                .select(
                    "column", "n_rows", "n_null", "n_distinct",
                    "min_num", "max_num", "mean_num", "min_str", "max_str",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.approx_count_distinct(c, 0.01).alias(f"{c}__nd"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.round(F.min(c).cast("double"), 6).alias(f"{c}__mn"))
            aggs.append(F.round(F.max(c).cast("double"), 6).alias(f"{c}__mx"))
            aggs.append(F.round(F.avg(F.col(c).cast("double")), 6).alias(f"{c}__av"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mn"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mx"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__av"))
        if isinstance(dt, T.StringType):
            aggs.append(F.min(c).alias(f"{c}__smn"))
            aggs.append(F.max(c).alias(f"{c}__smx"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__smn"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__smx"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _rows - `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`, "
        f"`{c}__av`, `{c}__smn`, `{c}__smx`"
        for c in cols
    )
    return wide.selectExpr(
        "_rows AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_num, max_num, mean_num, "
        "min_str, max_str)",
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_num", "max_num", "mean_num", "min_str", "max_str",
    )
