"""Round-6 wave 2: resampling inference, link prediction, and the
rest of the ranked-model evaluation harness.

Five surfaces extending SURVEY.md §2.13 (nearest reference surface is
the count-reconciliation audit in `pipeline_logic/`, which compares
point estimates with no uncertainty attached):

* ``stats_bootstrap_ci`` — Poisson-bootstrap confidence interval for
  mean daily revenue. Resampling is fully deterministic: each
  (day, resample) draws its Poisson(1) weight from an md5-derived
  32-bit uniform against precomputed integer CDF thresholds, so both
  engines materialize the *identical* 200 resamples.
* ``graph_link_prediction`` — common-neighbors / Jaccard /
  Adamic-Adar scores for non-adjacent part pairs on the co-purchase
  graph (the "you may also like" primitive).
* ``ml_cumulative_gains`` — decile cumulative-gains / lift table for
  the above-median-price rule, the marketing-science dual of the
  calibration table.
* ``ml_average_precision`` — AP (area under the precision-recall
  curve in its rank-sum form), completing ROC AUC for the
  class-imbalanced regime where AUC flatters.
* ``ml_ks_separation`` — the Kolmogorov-Smirnov separation statistic
  between positive and negative score distributions, computed as an
  exact integer argmax (no float CDF subtraction feeds the max).

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
# Deterministic Poisson(1) bootstrap
# ---------------------------------------------------------------------

#: P(X <= k) for X ~ Poisson(1), k = 0..5, as integer thresholds on a
#: 32-bit uniform (floor(CDF * 2^32)). Weight 6 is the >5 tail
#: (P ~ 5.9e-5). Shared by the Spark plan and the generated oracle so
#: the CASE ladders are textually derived from ONE constant tuple —
#: the two engines cannot disagree on a boundary.
_POIS1_CDF32 = (1580030168, 3160060337, 3950075421, 4213413783,
                4279248373, 4292415291)

_N_BOOT = 200


def _pois_case_sql(u: str) -> str:
    """CASE ladder mapping 32-bit uniform ``u`` to a Poisson(1) draw."""
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS1_CDF32)
    )
    return f"CASE {arms} ELSE 6 END"


# Daily revenue spine in exact integer cents: ~2,400 rows at ANY scale
# factor (the TPC-H order-date span is fixed), which is what makes the
# 200x resample blow-up a constant-size problem, not a data-size one.
_BOOT_ORACLE = f"""
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
),
grid AS (
  SELECT d.day, d.rev_c, t.b,
         ('0x' || substr(md5(d.day || '|' || CAST(t.b AS VARCHAR)), 1, 8))
           ::UBIGINT AS u
  FROM daily d, range(0, {_N_BOOT}) t(b)
),
weighted AS (
  SELECT b, rev_c, {_pois_case_sql('u')} AS w FROM grid
),
boot AS (
  SELECT b,
         SUM(w * rev_c) / (100.0 * SUM(w)) AS mean_b
  FROM weighted GROUP BY b HAVING SUM(w) > 0
),
ranked AS (
  SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn,
         COUNT(*) OVER () AS nb
  FROM boot
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM boot) AS n_resamples,
       (SELECT ROUND(SUM(rev_c) / (100.0 * COUNT(*)), 4) FROM daily)
         AS point_mean,
       ROUND(MIN(CASE WHEN rn = CAST(CEIL(nb * 0.025) AS BIGINT)
                      THEN mean_b END), 4) AS ci_lo,
       ROUND(MIN(CASE WHEN rn = CAST(CEIL(nb * 0.975) AS BIGINT)
                      THEN mean_b END), 4) AS ci_hi
FROM ranked
"""


@query("stats_bootstrap_ci", _BOOT_ORACLE)
def stats_bootstrap_ci(spark, sf_dir):
    """95% Poisson-bootstrap CI for mean daily revenue (dollars).

    Classic bootstrap needs n draws WITH replacement per resample —
    a shuffle per resample. The Poisson approximation gives each row
    an independent Poisson(1) weight instead, which is embarrassingly
    parallel: the whole 200-resample ensemble is ONE map over the
    (bounded, ~2,400-row) daily spine crossed with the resample index,
    then one aggregate. This is the form that scales: at 100 TB the
    spine is still 2,400 rows, and had we bootstrapped raw orders the
    weights would still be a map-side expression, never a shuffle.

    Determinism: the uniform is the first 8 md5 hex chars of
    ``day|b`` (the engine-portable hash idiom of the k-fold and A/B
    queries); the Poisson inverse-CDF thresholds are integer literals
    generated from ONE Python tuple into both plans. Each resample
    mean is an exact BIGINT-weighted sum divided once — bit-identical
    across engines — and the CI endpoints are rank-selected order
    statistics (ceil-rank, b-tiebroken), not interpolated quantiles,
    so no float summation-order noise can leak into the hash gate.
    """
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(
            F.col("o_orderdate").cast("date").cast("string").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("rev_c")
        )
    )
    grid = daily.crossJoin(
        F.broadcast(
            spark.range(_N_BOOT).select(F.col("id").alias("b"))
        )
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("day"), F.col("b").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(6)
    for k, thr in reversed(list(enumerate(_POIS1_CDF32))):
        w = F.when(u < thr, F.lit(k)).otherwise(w)
    boot = (
        grid.select("b", "rev_c", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("rev_c"))
                / (F.lit(100.0) * F.sum("w"))
            ).alias("mean_b")
        )
        .where(F.col("mean_b").isNotNull())
    )
    ranked = boot.select(
        "mean_b",
        F.row_number().over(Window.orderBy("mean_b", "b")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("nb"),
    )
    point = daily.agg(
        F.count("*").alias("n_days"),
        F.round(F.sum("rev_c") / (F.lit(100.0) * F.count("*")), 4).alias(
            "point_mean"
        ),
    )
    lo_rn = F.ceil(F.col("nb") * 0.025).cast("long")
    hi_rn = F.ceil(F.col("nb") * 0.975).cast("long")
    ci = ranked.agg(
        F.count("*").cast("long").alias("n_resamples"),
        F.round(
            F.min(F.when(F.col("rn") == lo_rn, F.col("mean_b"))), 4
        ).alias("ci_lo"),
        F.round(
            F.min(F.when(F.col("rn") == hi_rn, F.col("mean_b"))), 4
        ).alias("ci_hi"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        F.col("n_days").cast("long").alias("n_days"),
        "n_resamples",
        "point_mean",
        "ci_lo",
        "ci_hi",
    )


# ---------------------------------------------------------------------
# Link prediction on the co-purchase graph
# ---------------------------------------------------------------------

# Same canonical edge builder as the round-5 graph wave.
_EDGES_SQL = """
items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
edges AS (
  SELECT a.item AS src, b.item AS dst, COUNT(*) AS weight
  FROM items a JOIN items b ON a.ok = b.ok AND a.item < b.item
  GROUP BY 1, 2
)
"""

#: wedge centers with degree above this cap are skipped. Hubs cost
#: deg^2 in the pair join while contributing near-zero signal (their
#: Adamic-Adar term is 1/ln(deg) ~ 0 and they inflate every Jaccard
#: denominator they touch) — capping the center is the standard
#: link-prediction scale guard. Applied identically in both engines,
#: so the contract holds whether or not the cap binds.
_LP_DEG_CAP = 500

#: edges below this co-purchase weight are noise for link prediction:
#: the single-co-occurrence graph densifies linearly with corpus size
#: (measured: 1.48e9 wedges at sf1, max degree 222 — the 500 hub cap
#: never binds because density, not hubs, is what explodes), while the
#: repeat-co-purchase backbone stays signal-bounded (~14k wedges at
#: BOTH sf0.01 and sf1). Same densification guard
#: ``graph_component_sizes`` uses.
_LP_MIN_WEIGHT = 2

_LP_ORACLE = f"""
WITH {_EDGES_SQL.strip()}
, backbone AS (
  SELECT src, dst FROM edges WHERE weight >= {_LP_MIN_WEIGHT}
),
adj AS (
  SELECT src AS z, dst AS nb FROM backbone
  UNION ALL
  SELECT dst AS z, src AS nb FROM backbone
),
deg AS (SELECT z AS node, COUNT(*) AS degree FROM adj GROUP BY 1),
pairs AS (
  SELECT a.nb AS u, b.nb AS v,
         COUNT(*) AS cn,
         SUM(1.0 / LN(d.degree)) AS aa
  FROM adj a
  JOIN adj b ON a.z = b.z AND a.nb < b.nb
  JOIN deg d ON d.node = a.z
  WHERE d.degree <= {_LP_DEG_CAP}
  GROUP BY 1, 2
),
nonedges AS (
  SELECT p.* FROM pairs p
  ANTI JOIN edges e ON e.src = p.u AND e.dst = p.v
),
scored AS (
  SELECT n.u, n.v, n.cn, n.aa,
         n.cn / CAST(du.degree + dv.degree - n.cn AS DOUBLE) AS jac
  FROM nonedges n
  JOIN deg du ON du.node = n.u
  JOIN deg dv ON dv.node = n.v
)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(cn AS BIGINT) AS common_neighbors,
       ROUND(jac, 6) AS jaccard,
       ROUND(aa, 6) AS adamic_adar
FROM scored
ORDER BY jac DESC, cn DESC, u, v
LIMIT 20
"""


@query("graph_link_prediction", _LP_ORACLE)
def graph_link_prediction(spark, sf_dir):
    """Top-20 predicted links (part pairs never co-purchased but with
    the highest neighborhood overlap): common-neighbor count, Jaccard
    coefficient, and Adamic-Adar score.

    Shape: restrict to the repeat-co-purchase backbone (weight >= 2 —
    see ``_LP_MIN_WEIGHT``: the single-co-occurrence graph densifies
    with corpus size, 1.48e9 wedges at sf1, while the backbone's wedge
    count is signal-bounded, ~14k at both sf0.01 and sf1), symmetrize,
    enumerate wedges by joining the adjacency list with itself on the
    center, anti-join ALL existing edges (strict "never co-purchased"),
    score. The wedge join is the honest Sum(deg_z^2) cost of
    common-neighbor counting; the residual scale guard is the
    center-degree cap (hubs are signal-free here — see
    ``_LP_DEG_CAP``), the same hub discipline the triangle query gets
    from degree orientation. Ordering is
    deterministic end to end: ``jac`` is one IEEE division of exact
    integers (bit-identical across engines) and ties break on the
    exact (cn, u, v) — both engines cut the same top-20 set.
    """
    from data_pipeline_001_spark.operators.graph import copurchase_edges

    t = load_tables(spark, sf_dir)
    edges = copurchase_edges(t["lineitem"])
    backbone = edges.where(F.col("weight") >= _LP_MIN_WEIGHT).select(
        "src", "dst"
    )
    adj = backbone.select(
        F.col("src").alias("z"), F.col("dst").alias("nb")
    ).unionAll(
        backbone.select(F.col("dst").alias("z"), F.col("src").alias("nb"))
    )
    deg = adj.groupBy(F.col("z").alias("node")).agg(
        F.count("*").alias("degree")
    )
    a, b = adj.alias("a"), adj.alias("b")
    pairs = (
        a.join(b, (F.col("a.z") == F.col("b.z")) & (F.col("a.nb") < F.col("b.nb")))
        .join(
            deg.where(F.col("degree") <= _LP_DEG_CAP).alias("d"),
            F.col("d.node") == F.col("a.z"),
        )
        .groupBy(F.col("a.nb").alias("u"), F.col("b.nb").alias("v"))
        .agg(
            F.count("*").alias("cn"),
            F.sum(F.lit(1.0) / F.log(F.col("d.degree"))).alias("aa"),
        )
    )
    nonedges = pairs.join(
        edges,
        (edges["src"] == pairs["u"]) & (edges["dst"] == pairs["v"]),
        "left_anti",
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    scored = (
        nonedges.join(du, F.col("du.node") == F.col("u"))
        .join(dv, F.col("dv.node") == F.col("v"))
        .select(
            "u",
            "v",
            "cn",
            "aa",
            (
                F.col("cn")
                / (
                    F.col("du.degree") + F.col("dv.degree") - F.col("cn")
                ).cast("double")
            ).alias("jac"),
        )
    )
    return (
        scored.orderBy(
            F.col("jac").desc(), F.col("cn").desc(), F.col("u"), F.col("v")
        )
        .limit(20)
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.round(F.col("jac"), 6).alias("jaccard"),
            F.round(F.col("aa"), 6).alias("adamic_adar"),
        )
    )


# ---------------------------------------------------------------------
# Ranked-model evaluation: gains/lift, AP, KS
# ---------------------------------------------------------------------

# The shared scored frame: exact integer-cents score, binary label.
_SCORED_SQL = """
scored AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score_c,
         o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
)
"""


@query(
    "ml_cumulative_gains",
    f"""
    WITH {_SCORED_SQL.strip()},
    binned AS (
      SELECT y, NTILE(10) OVER (ORDER BY score_c DESC, o_orderkey) AS decile
      FROM scored
    ),
    per AS (
      SELECT decile, COUNT(*) AS n, SUM(y) AS n_pos
      FROM binned GROUP BY 1
    ),
    cum AS (
      SELECT decile, n, n_pos,
             SUM(n) OVER (ORDER BY decile) AS cum_n,
             SUM(n_pos) OVER (ORDER BY decile) AS cum_pos,
             SUM(n) OVER () AS tot_n,
             SUM(n_pos) OVER () AS tot_pos
      FROM per
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           ROUND(cum_pos / CAST(tot_pos AS DOUBLE), 6) AS cum_gain,
           ROUND((cum_pos / CAST(tot_pos AS DOUBLE))
                 / (cum_n / CAST(tot_n AS DOUBLE)), 6) AS cum_lift
    FROM cum ORDER BY decile
    """,
)
def ml_cumulative_gains(spark, sf_dir):
    """Cumulative-gains / lift table: rank by score descending, cut
    into deciles, report the share of all positives captured by the
    top k deciles and the lift over random targeting. The dual of the
    calibration table (``ml_calibration_bins``): calibration asks "is
    the score honest", gains asks "is the score USEFUL". Deterministic
    NTILE on (exact cents DESC, key); the cumulative window runs over
    10 rows. Scale: one global sort for NTILE (same posture as every
    ranked-eval query here — at 100 TB you'd NTILE within stratified
    shards), then constant-size windows."""
    t = load_tables(spark, sf_dir)
    scored = t["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_c"),
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    binned = scored.select(
        "y",
        F.ntile(10)
        .over(Window.orderBy(F.col("score_c").desc(), F.col("o_orderkey")))
        .alias("decile"),
    )
    per = binned.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("y").alias("n_pos")
    )
    wc = Window.orderBy("decile")
    wall = Window.partitionBy()
    cum = per.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("n_pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wall).alias("tot_n"),
        F.sum("n_pos").over(wall).alias("tot_pos"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(
            F.col("cum_pos") / F.col("tot_pos").cast("double"), 6
        ).alias("cum_gain"),
        F.round(
            (F.col("cum_pos") / F.col("tot_pos").cast("double"))
            / (F.col("cum_n") / F.col("tot_n").cast("double")),
            6,
        ).alias("cum_lift"),
    ).orderBy("decile")


@query(
    "ml_average_precision",
    f"""
    WITH {_SCORED_SQL.strip()},
    ranked AS (
      SELECT y,
             ROW_NUMBER() OVER (ORDER BY score_c DESC, o_orderkey) AS r,
             SUM(y) OVER (ORDER BY score_c DESC, o_orderkey) AS cum_pos
      FROM scored
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(SUM(CASE WHEN y = 1 THEN cum_pos / CAST(r AS DOUBLE)
                          ELSE 0 END) / SUM(y), 6) AS average_precision,
           ROUND(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS baseline
    FROM ranked
    """,
)
def ml_average_precision(spark, sf_dir):
    """Average precision (area under the precision-recall curve, in
    its exact rank-sum form): mean of precision@r over the ranks r of
    the positives. Completes ROC AUC for class-imbalanced corpora
    where AUC flatters — AP's baseline is the prevalence, not 0.5.
    Same deterministic ranking discipline as ``ml_roc_auc`` (exact
    integer-cents score, key-tiebroken, so both engines assign every
    row the same rank); one window pass + one aggregate, no threshold
    sweep, no per-point curve materialization."""
    t = load_tables(spark, sf_dir)
    scored = t["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_c"),
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    w = Window.orderBy(F.col("score_c").desc(), F.col("o_orderkey"))
    ranked = scored.select(
        "y",
        F.row_number().over(w).alias("r"),
        F.sum("y").over(w).alias("cum_pos"),
    )
    y = F.col("y")
    return ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(y).cast("long").alias("n_pos"),
        F.round(
            F.sum(
                F.when(y == 1, F.col("cum_pos") / F.col("r").cast("double"))
                .otherwise(0.0)
            )
            / F.sum(y),
            6,
        ).alias("average_precision"),
        F.round(F.sum(y) / F.count("*").cast("double"), 6).alias("baseline"),
    )


@query(
    "ml_ks_separation",
    f"""
    WITH {_SCORED_SQL.strip()},
    tot AS (
      SELECT SUM(y) AS np, SUM(1 - y) AS nn FROM scored
    ),
    cdf AS (
      SELECT score_c,
             SUM(SUM(y)) OVER (ORDER BY score_c) AS cp,
             SUM(SUM(1 - y)) OVER (ORDER BY score_c) AS cnn
      FROM scored GROUP BY score_c
    ),
    gap AS (
      SELECT c.score_c,
             ABS(c.cp * t.nn - c.cnn * t.np) AS sep_num,
             t.np, t.nn
      FROM cdf c, tot t
    )
    SELECT CAST(np AS BIGINT) AS n_pos,
           CAST(nn AS BIGINT) AS n_neg,
           ROUND(sep_num / (np * CAST(nn AS DOUBLE)), 6) AS ks,
           ROUND(score_c / 100.0, 2) AS ks_at_score
    FROM gap
    ORDER BY sep_num DESC, score_c
    LIMIT 1
    """,
)
def ml_ks_separation(spark, sf_dir):
    """Kolmogorov-Smirnov separation between the positive and
    negative score distributions — max_t |F_pos(t) - F_neg(t)| — the
    credit-scoring twin of ROC AUC. The max is taken over the exact
    integer cross-product |cp*nn - cn*np| (BIGINT, never a float CDF
    difference), so the argmax threshold and the statistic survive
    the hash gate bit-for-bit; the single float division happens once,
    after the argmax. One groupBy on the distinct score + one ordered
    window + a top-1 — the same sort-based shape as the rank-sum AUC,
    never a quadratic threshold sweep."""
    t = load_tables(spark, sf_dir)
    scored = t["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_c"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    tot = scored.agg(
        F.sum("y").alias("np"), F.sum(F.lit(1) - F.col("y")).alias("nn")
    )
    per = scored.groupBy("score_c").agg(
        F.sum("y").alias("p"), F.sum(F.lit(1) - F.col("y")).alias("q")
    )
    w = Window.orderBy("score_c")
    cdf = per.select(
        "score_c",
        F.sum("p").over(w).alias("cp"),
        F.sum("q").over(w).alias("cnn"),
    )
    gap = cdf.crossJoin(F.broadcast(tot)).select(
        "score_c",
        F.abs(
            F.col("cp") * F.col("nn") - F.col("cnn") * F.col("np")
        ).alias("sep_num"),
        "np",
        "nn",
    )
    return (
        gap.orderBy(F.col("sep_num").desc(), F.col("score_c"))
        .limit(1)
        .select(
            F.col("np").cast("long").alias("n_pos"),
            F.col("nn").cast("long").alias("n_neg"),
            F.round(
                F.col("sep_num") / (F.col("np") * F.col("nn").cast("double")),
                6,
            ).alias("ks"),
            F.round(F.col("score_c") / 100.0, 2).alias("ks_at_score"),
        )
    )
