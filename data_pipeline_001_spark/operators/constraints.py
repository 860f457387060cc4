"""Declarative data-quality constraint checking (Deequ-style), the
analytics-engine generalization of the reference's count-audit stage
(pipeline_logic/core/audit_manager.py — count reconciliation with
tolerance): instead of one hard-coded count compare, a table of named
constraints evaluated in ONE aggregation pass.

Design: every constraint contributes one aggregate expression; all of
them evaluate in a single ``agg`` over one scan (Catalyst fuses them
map-side), then the observed values are unpivoted to a
(constraint, observed, threshold, passed) report via ``stack`` — no
per-constraint jobs, no driver loop. Referential-integrity checks
(which need a second table) run as a LEFT ANTI join count folded into
the same report.

At 100 TB this is the difference between a constraint suite that
costs one table scan and one that costs one scan per constraint.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SIMPLE_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class Constraint:
    """A named measurement plus the predicate it must satisfy.

    ``observe`` is any aggregate Column (evaluates to double);
    ``minimum``/``maximum`` bound the observed value (inclusive).
    """

    name: str
    observe: Column
    minimum: float | None = None
    maximum: float | None = None


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value."""
    return F.avg(F.col(col).isNotNull().cast("double"))


def uniqueness(col: str) -> Column:
    """distinct / total — 1.0 means the column is a key."""
    return F.count_distinct(F.col(col)) / F.count(F.lit(1)).cast("double")


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate all constraints in one aggregation over one scan.

    Returns (check_name, observed, lo, hi, passed[int]) — one row per
    constraint, observed rounded to 6 to keep report values
    engine-portable.

    Constraint names must be simple identifiers: they are interpolated
    into the ``stack()`` selectExpr and backtick aliases, so a quote or
    backtick in a name would produce broken SQL at runtime.
    """
    for c in constraints:
        if not _SIMPLE_NAME.match(c.name):
            raise ValueError(
                f"constraint name must match [A-Za-z_][A-Za-z0-9_]*, "
                f"got {c.name!r}"
            )
    aggs = [
        F.round(c.observe.cast("double"), 6).alias(c.name) for c in constraints
    ]
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c.name}', `{c.name}`" for c in constraints)
    long = row.selectExpr(
        f"stack({len(constraints)}, {stack_args}) AS (check_name, observed)"
    )
    bounds = F.create_map(
        *[
            x
            for c in constraints
            for x in (
                F.lit(c.name),
                F.struct(
                    F.lit(
                        c.minimum if c.minimum is not None else float("-inf")
                    ).alias("lo"),
                    F.lit(
                        c.maximum if c.maximum is not None else float("inf")
                    ).alias("hi"),
                ),
            )
        ]
    )
    return long.select(
        "check_name",
        "observed",
        bounds[F.col("check_name")]["lo"].alias("lo"),
        bounds[F.col("check_name")]["hi"].alias("hi"),
    ).withColumn(
        "passed",
        (
            (F.col("observed") >= F.col("lo"))
            & (F.col("observed") <= F.col("hi"))
        ).cast("int"),
    )


def referential_integrity(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """(check_name, observed, lo, hi, passed) single-row report: the
    fraction of child rows whose key exists in parent. LEFT ANTI join
    (shuffle on the key; AQE broadcasts small parents) — the orphan
    count never leaves the executors."""
    n = child.count()
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .where(F.col("k").isNotNull())
        .join(
            parent.select(F.col(parent_key).alias("k")).distinct(),
            "k",
            "left_anti",
        )
        .count()
    )
    frac = 1.0 if n == 0 else round(1.0 - orphans / n, 6)
    spark = child.sparkSession
    return spark.createDataFrame(
        [(f"fk_{child_key}_in_{parent_key}", float(frac), 1.0, 1.0, int(frac >= 1.0))],
        "check_name string, observed double, lo double, hi double, passed int",
    )

def drift_psi(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard training-data drift monitor (PSI > 0.2 is
    the conventional "investigate" threshold).

    Deterministic equi-width bins over [lo, hi) (fixed edges, NOT
    quantile-derived, so the report is reproducible and incremental
    snapshots are comparable); values outside the range clamp to the
    edge bins. Each side is one narrow aggregation keyed on bin
    (map-side partial counts — at 100 TB the shuffle carries n_bins
    partials per task); the join between two n_bins-row tables is
    trivially broadcast.

    Returns one row per bin: (bin, pct_base, pct_cur, psi_term) with
    psi_term = (p_cur − p_base)·ln(p_cur / p_base), eps-floored so
    empty bins contribute a finite penalty. Total PSI = Σ psi_term.
    """
    if hi <= lo:
        raise ValueError("hi must be > lo")
    width = (hi - lo) / n_bins

    def _binned(df: DataFrame, cnt_name: str) -> DataFrame:
        b = F.floor((F.col(value_col).cast("double") - lo) / width)
        b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)).cast("int")
        return (
            df.where(F.col(value_col).isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(cnt_name))
        )

    spine = baseline.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    base = _binned(baseline, "n_base")
    cur = _binned(current, "n_cur")
    joined = (
        spine.join(F.broadcast(base), "bin", "left")
        .join(F.broadcast(cur), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    p_base = F.greatest(F.col("n_base") / F.col("tb"), F.lit(eps))
    p_cur = F.greatest(F.col("n_cur") / F.col("tc"), F.lit(eps))
    return joined.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.round(F.col("n_base") / F.col("tb"), 6).alias("pct_base"),
        F.round(F.col("n_cur") / F.col("tc"), 6).alias("pct_cur"),
        (F.round((p_cur - p_base) * F.log(p_cur / p_base), 6) + F.lit(0.0)).alias(
            "psi_term"
        ),
    )


_CHECKSUM_MOD = 2305843009213693951  # 2^61 - 1 (Mersenne prime)


def content_checksum(cols: list[str]) -> Column:
    """Order-insensitive content checksum AGGREGATE over the given
    columns: per-row 60-bit md5 digests summed exactly (decimal
    accumulator — a bigint SUM would overflow silently) and reduced
    mod 2⁶¹−1.

    This upgrades the count-only audit (reference A5,
    `pipeline_utils/audit_utils.py` count reconciliation) to CONTENT
    reconciliation: equal counts with a flipped row still mismatch.
    Sum is commutative, so the checksum is independent of row order
    and partitioning — two tables agree iff their multisets of
    selected columns agree (modulo 2⁻⁶⁰ collision odds per row).
    NULLs map to an explicit sentinel BEFORE the join — concat_ws
    silently drops nulls, which would give (a, NULL, x) and
    (a, x, NULL) the same digest. Pick columns with engine-stable
    string forms (ints, strings — not floats or timestamps, whose
    text renderings differ by engine).
    """
    row = F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in cols],
    )
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    return (
        F.sum(h.cast("decimal(38,0)")) % F.lit(_CHECKSUM_MOD)
    ).cast("long")


def xmr_control_points(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Shewhart XmR (individuals / moving-range) control points over a
    metric series: one row per input point with the natural process
    limits xbar ± 2.66·mRbar (Wheeler's form — public) and an
    ``out_of_control`` flag.

    This is the per-point form of the ``quality_spc_xmr`` registry
    query, factored so the pipeline can run the same chart over its
    OWN control table (window → audited target_count series) as a
    post-audit gate: the reference's audit stage stops at per-window
    count tolerance (audit_manager.py:385-392); the chart catches the
    window whose count is individually "correct" but anomalous against
    the process history — a dropped upstream feed, a double-fired
    schedule.

    The unpartitioned ORDER BY window is safe here by construction:
    the series is one row per pipeline window (a control table, never
    a data table) — thousands of points at most, regardless of data
    scale.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy(key_col)
    ranged = df.select(
        key_col,
        F.col(value_col).cast("double").alias("value"),
        F.abs(
            F.col(value_col).cast("double")
            - F.lag(F.col(value_col).cast("double")).over(w)
        ).alias("mr"),
    )
    lims = ranged.agg(
        F.avg("value").alias("xbar"),
        F.avg("mr").alias("mrbar"),
        F.count("*").alias("n_points"),
    )
    return ranged.crossJoin(F.broadcast(lims)).select(
        key_col,
        "value",
        "xbar",
        (F.col("xbar") + 2.66 * F.col("mrbar")).alias("ucl"),
        (F.col("xbar") - 2.66 * F.col("mrbar")).alias("lcl"),
        "n_points",
        (
            (F.col("value") > F.col("xbar") + 2.66 * F.col("mrbar"))
            | (F.col("value") < F.col("xbar") - 2.66 * F.col("mrbar"))
        ).alias("out_of_control"),
    )
