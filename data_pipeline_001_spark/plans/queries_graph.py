"""Graph, survival, and feature-engineering analytics — round-5 wave.

Extends the engine's §2.13 surface with the graph primitives and
ML-prep transforms a large-scale training-data pipeline runs next to
dedup/curation: co-occurrence graph metrics (degree profile, triangle
count / clustering coefficient, PageRank), Kaplan-Meier survival over
order fulfilment, smoothed target encoding, hash-stable k-fold
assignment, equal-frequency binning, CUSUM changepoint detection, and
lagged cross-correlation. Wave 2 adds repeat-co-purchase component
sizes, Mann-Kendall trend, Spearman rank correlation, the
Wald-Wolfowitz runs test (all over exact integer-cents daily series —
see the CUSUM drift lesson), hashing-trick feature buckets, scaler
parameter tables, and crossed-feature support audits. Every query is
DuckDB-oracle-backed; graph algorithms live in ``operators/graph.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

# Item co-occurrence edges within an order, id-canonical (src < dst).
# DISTINCT first so a part split across line rows counts once.
_EDGES_SQL = """
items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
edges AS (
  SELECT a.item AS src, b.item AS dst, COUNT(*) AS weight
  FROM items a JOIN items b ON a.ok = b.ok AND a.item < b.item
  GROUP BY 1, 2
)
"""


def _edges(spark, sf_dir):
    from data_pipeline_001_spark.operators.graph import copurchase_edges

    t = load_tables(spark, sf_dir)
    return copurchase_edges(t["lineitem"])


@query(
    "graph_degree_buckets",
    f"""
    WITH {_EDGES_SQL.strip().lstrip()}
    , deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      ) GROUP BY node
    )
    SELECT CAST(length(bin(degree)) - 1 AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(degree) AS BIGINT) AS min_degree,
           CAST(MAX(degree) AS BIGINT) AS max_degree
    FROM deg GROUP BY 1
    """,
)
def graph_degree_buckets(spark, sf_dir):
    """Degree distribution of the part co-occurrence graph in
    power-of-two buckets (floor(log2 d) computed EXACTLY as
    length(bin(d))-1 — float log2 rounds differently across engines
    at power boundaries). One self-join + two aggregations; the
    degree profile is the input to skew decisions (salting threshold,
    hub caps) every other graph pass here makes."""
    from data_pipeline_001_spark.operators.graph import degrees

    deg = degrees(_edges(spark, sf_dir))
    return (
        deg.select(
            (F.length(F.bin(F.col("degree"))) - 1)
            .cast("int")
            .alias("bucket"),
            "degree",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("degree").cast("long").alias("min_degree"),
            F.max("degree").cast("long").alias("max_degree"),
        )
    )


@query(
    "graph_triangle_stats",
    f"""
    WITH {_EDGES_SQL.strip().lstrip()}
    , deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      ) GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN (ds.degree, e.src) < (dd.degree, e.dst)
                  THEN e.src ELSE e.dst END AS u,
             CASE WHEN (ds.degree, e.src) < (dd.degree, e.dst)
                  THEN e.dst ELSE e.src END AS v
      FROM edges e
      JOIN deg ds ON ds.node = e.src
      JOIN deg dd ON dd.node = e.dst
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM (SELECT w1.v AS v1, w2.v AS v2
            FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u
            WHERE w1.v < w2.v) w
      JOIN edges c ON c.src = w.v1 AND c.dst = w.v2
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           (SELECT CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           ROUND(3.0 * tri.n_triangles /
                 (SELECT SUM(degree * (degree - 1) / 2.0) FROM deg), 6)
             AS global_clustering
    FROM tri
    """,
)
def graph_triangle_stats(spark, sf_dir):
    """Triangle count + global clustering coefficient of the part
    co-occurrence graph via degree-ordered orientation (out-degree
    bounded by sqrt(2m), so the wedge join never explodes on hub
    parts — the Suri-Vassilvitskii MapReduce formulation). Exact
    integer counts both engines."""
    from data_pipeline_001_spark.operators.graph import triangle_stats

    return triangle_stats(_edges(spark, sf_dir))


@query(
    "graph_triangle_approx",
    f"""
    WITH {_EDGES_SQL.strip().lstrip()}
    , kept AS (
      SELECT src, dst FROM edges
      WHERE substr(md5(CAST(src AS VARCHAR) || '_' || CAST(dst AS VARCHAR)),
                   1, 2) <= '3f'
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT src AS node FROM kept UNION ALL SELECT dst FROM kept
      ) GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN (ds.degree, e.src) < (dd.degree, e.dst)
                  THEN e.src ELSE e.dst END AS u,
             CASE WHEN (ds.degree, e.src) < (dd.degree, e.dst)
                  THEN e.dst ELSE e.src END AS v
      FROM kept e
      JOIN deg ds ON ds.node = e.src
      JOIN deg dd ON dd.node = e.dst
    ),
    tri AS (
      SELECT COUNT(*) AS n
      FROM (SELECT w1.v AS v1, w2.v AS v2
            FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u
            WHERE w1.v < w2.v) w
      JOIN kept c ON c.src = w.v1 AND c.dst = w.v2
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges_full,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_edges_kept,
           0.25 AS sample_p,
           CAST(tri.n * 64 AS BIGINT) AS est_triangles
    FROM tri
    """,
)
def graph_triangle_approx(spark, sf_dir):
    """DOULION triangle estimate (round-5 verdict item 6): the exact
    form is the honest Θ(m^1.5) wedge join (107 s at sf1); at 100 TB
    the answer is sampling. Each edge survives a deterministic
    md5-prefix coin with p = 1/4, triangles are counted exactly on
    the sparsified graph and scaled by 1/p³ = 64 (unbiased,
    Tsourakakis et al. KDD'09) — the surviving wedge join is ~p^1.5 =
    1/8 of the exact cost, and p dials accuracy vs cost. Because the
    coin is content-addressed (not RNG), the whole estimate is
    bit-reproducible and the oracle twin runs the IDENTICAL pipeline
    in SQL — an exact hash gate, while the ±ε accuracy contract
    against the true count is pinned by the planted-graph pytest."""
    from data_pipeline_001_spark.operators.graph import triangle_estimate

    return triangle_estimate(_edges(spark, sf_dir), keep_buckets=64)


def _pagerank_oracle_sql(iterations: int = 5, damping: float = 0.85) -> str:
    """Chained-CTE power iteration, one CTE per step, each step
    rounded to 8 decimals — the identical arithmetic the Spark
    operator runs, so scores hash-match exactly (the same generated-
    oracle pattern as ``text_bpe_train``)."""
    head = f"""
WITH {_EDGES_SQL.strip().lstrip()}
, sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM deg),
pr0 AS (SELECT node, ROUND(1.0 / nn.n, 8) AS pr FROM deg CROSS JOIN nn)
"""
    steps = []
    for k in range(1, iterations + 1):
        steps.append(f"""
pr{k} AS (
  SELECT e.dst AS node,
         ROUND({1.0 - damping} / ANY_VALUE(nn.n)
               + {damping} * SUM(p.pr / d.deg), 8) AS pr
  FROM sym e
  JOIN pr{k - 1} p ON p.node = e.src
  JOIN deg d ON d.node = e.src
  CROSS JOIN nn
  GROUP BY e.dst
)""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
SELECT node, ROUND(pr, 6) AS pagerank
FROM pr{iterations}
ORDER BY pagerank DESC, node ASC LIMIT 20
"""
    )


@query("graph_pagerank_top", _pagerank_oracle_sql(5, 0.85))
def graph_pagerank_top(spark, sf_dir):
    """Top-20 PageRank parts (5 synchronous power steps, d=0.85) over
    the symmetrized co-occurrence graph. Per-step rounding to 8
    decimals makes the trajectory bit-stable across engines and
    partitionings; each step is one shuffle (groupBy dst), so the
    iteration count — not data volume — bounds plan depth at 100 TB."""
    from data_pipeline_001_spark.operators.graph import pagerank

    pr = pagerank(_edges(spark, sf_dir), iterations=5, damping=0.85)
    return (
        pr.select("node", F.round("pr", 6).alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), F.col("node").asc())
        .limit(20)
    )


@query(
    "survival_kaplan_meier",
    """
    WITH dur AS (
      SELECT datediff('day', o.o_orderdate, MAX(l.l_shipdate)) AS t,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
      HAVING datediff('day', o.o_orderdate, MAX(l.l_shipdate)) >= 0
    ),
    by_t AS (
      SELECT t, SUM(ev) AS d, COUNT(*) AS c FROM dur GROUP BY t
    ),
    km AS (
      SELECT t, d, c,
             (SELECT COUNT(*) FROM dur)
               - COALESCE(SUM(c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM by_t
    )
    SELECT CAST(t AS INT) AS t,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN d = n_risk THEN 0.0
                ELSE ROUND(EXP(SUM(
                       CASE WHEN d < n_risk
                            THEN LN(1.0 - d / CAST(n_risk AS DOUBLE))
                            ELSE NULL END)
                     OVER (ORDER BY t)), 6) END AS survival
    FROM km
    """,
)
def survival_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve of order fulfilment time (days
    from order date to last shipment; open/pending orders are
    right-censored, status F is the event). Product-limit estimator
    via exp(cumulative sum of log factors) — one aggregation per
    distinct duration plus one window pass, no per-subject state. The
    d == n_risk terminal factor (survival hits exactly 0) is handled
    explicitly: Spark's ln(0) is NULL where DuckDB's is -inf."""
    t = load_tables(spark, sf_dir)
    dur = (
        t["orders"]
        .join(
            t["lineitem"],
            t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"],
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.datediff(F.col("last_ship"), F.col("o_orderdate")).alias("t"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
        )
        .where(F.col("t") >= 0)
    )
    total = dur.agg(F.count("*").alias("n_total"))
    by_t = dur.groupBy("t").agg(
        F.sum("ev").alias("d"), F.count("*").alias("c")
    )
    w_prev = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    km = by_t.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("n_total") - F.coalesce(F.sum("c").over(w_prev), F.lit(0)),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    log_factor = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d") / F.col("n_risk").cast("double")),
    )
    return km.select(
        F.col("t").cast("int").alias("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(log_factor).over(w_cum)), 6))
        .alias("survival"),
    )


@query(
    "ml_target_encoding",
    """
    WITH g AS (SELECT AVG(o_totalprice) AS gm FROM orders),
    by_nation AS (
      SELECT c.c_nationkey, COUNT(*) AS n, SUM(o.o_totalprice) AS s
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    )
    SELECT CAST(c_nationkey AS INT) AS nationkey,
           CAST(n AS BIGINT) AS n_orders,
           ROUND((s + 10.0 * g.gm) / (n + 10.0), 6) AS encoded_price
    FROM by_nation CROSS JOIN g
    """,
)
def ml_target_encoding(spark, sf_dir):
    """Smoothed target (mean) encoding of customer nation against
    order price — the leakage-safe categorical encoder (m=10
    pseudo-observations of the global mean shrink rare categories).
    One groupBy plus a broadcast 1-row global mean: the encoder table
    for a 100 TB corpus is |categories| rows and broadcasts back for
    application."""
    t = load_tables(spark, sf_dir)
    g = t["orders"].agg(F.avg("o_totalprice").alias("gm"))
    by_nation = (
        t["orders"]
        .join(
            t["customer"],
            t["customer"]["c_custkey"] == t["orders"]["o_custkey"],
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
    )
    return by_nation.crossJoin(F.broadcast(g)).select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.col("n").cast("long").alias("n_orders"),
        F.round(
            (F.col("s") + F.lit(10.0) * F.col("gm"))
            / (F.col("n") + F.lit(10.0)),
            6,
        ).alias("encoded_price"),
    )


@query(
    "ml_kfold_assignment",
    """
    SELECT CAST(ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) % 5
                AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 6) AS avg_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY 1
    """,
)
def ml_kfold_assignment(spark, sf_dir):
    """Hash-stable 5-fold cross-validation assignment (ascii of the
    first md5 hex char mod k — the same engine-portable bucketing the
    A/B and jackknife queries use) with per-fold balance stats. Pure
    map-side expression: fold membership is reproducible across
    engines, runs, and partitionings, which is what makes CV splits
    auditable on a shared 100 TB corpus."""
    t = load_tables(spark, sf_dir)
    fold = (
        F.ascii(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1))
        % 5
    ).cast("int")
    return (
        t["orders"]
        .groupBy(fold.alias("fold"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
    )


@query(
    "ml_quantile_binning",
    """
    WITH binned AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM binned GROUP BY 1
    """,
)
def ml_quantile_binning(spark, sf_dir):
    """Equal-frequency discretization of order price into 10 bins
    (deterministic NTILE tie-break on the key) with per-bin edges —
    the feature-binning table a trainer consumes. ORACLE-TWIN NOTE:
    exact NTILE is a global sort; the scale path at 100 TB is the
    approx-percentile cut-point variant (`agg_kll_quantile_sketch` /
    `window_quartiles_approx` document that family) — this exact form
    is the small-sf contract for it."""
    t = load_tables(spark, sf_dir)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .select("o_totalprice", F.ntile(10).over(w).alias("bin"))
        .groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
    )


@query(
    "stats_cusum_changepoint",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT COUNT(*) AS n_days, SUM(rev_c) AS total_c FROM daily
    ),
    cu AS (
      SELECT day,
             tot.n_days * SUM(rev_c) OVER (ORDER BY day)
               - (ROW_NUMBER() OVER (ORDER BY day)) * tot.total_c
               AS cusum_scaled,
             tot.n_days
      FROM daily CROSS JOIN tot
    )
    SELECT day,
           ROUND(cusum_scaled / (n_days * 100.0), 4) AS cusum,
           CAST(ABS(cusum_scaled) =
                (SELECT MAX(ABS(cusum_scaled)) FROM cu) AS BOOLEAN)
             AS is_peak
    FROM cu
    """,
)
def stats_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint statistic over daily revenue: cumulative sum
    of deviations from the global mean, peak |CUSUM| marks the most
    likely level-shift day (Page 1954). Computed in EXACT integer
    cents — cusum_t·N = N·(running sum) - rank·total — because the
    naive float form (cumulative Σ(rev-μ) over ~2400 days) drifts
    past round-4 granularity between engines; the peak flag compares
    scaled BIGINTs, so it can never flip on a last-ulp difference.
    One day-grain aggregate, a broadcast 1-row total, one window
    pass — the series table is calendar-bounded regardless of corpus
    size."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("rev_c")
        )
    )
    tot = daily.agg(
        F.count("*").alias("n_days"), F.sum("rev_c").alias("total_c")
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_rank = Window.orderBy("day")
    cu = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (
            F.col("n_days") * F.sum("rev_c").over(w_cum)
            - F.row_number().over(w_rank).cast("long") * F.col("total_c")
        ).alias("cusum_scaled"),
        "n_days",
    )
    peak = cu.agg(F.max(F.abs(F.col("cusum_scaled"))).alias("mx"))
    return cu.crossJoin(F.broadcast(peak)).select(
        "day",
        F.round(
            F.col("cusum_scaled") / (F.col("n_days") * F.lit(100.0)), 4
        ).alias("cusum"),
        (F.abs(F.col("cusum_scaled")) == F.col("mx")).alias("is_peak"),
    )


@query(
    "stats_crosscorr_lags",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS cnt,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    lags AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS lag)
    SELECT g.lag,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CORR(a.rev, b.cnt), 6) AS xcorr
    FROM lags g
    JOIN daily a ON TRUE
    JOIN daily b ON b.day = a.day - g.lag
    GROUP BY g.lag
    """,
)
def stats_crosscorr_lags(spark, sf_dir):
    """Lagged cross-correlation between daily order volume and daily
    revenue (does volume lead revenue?): corr(rev_t, cnt_{t-lag}) for
    lags 0..7, joined on the calendar so gap days pair only where
    both sides exist. Calendar-bounded intermediate, algebraic corr —
    scales with days, not rows."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count("*").cast("double").alias("cnt"),
            F.sum("o_totalprice").alias("rev"),
        )
    )
    lags = spark.range(0, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day"), F.col("rev"))
    b = daily.select(F.col("day").alias("bday"), F.col("cnt"))
    return (
        lags.crossJoin(a)
        .join(b, F.col("bday") == F.date_sub(F.col("day"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.corr("rev", "cnt"), 6).alias("xcorr"),
        )
    )


_W2_EDGES_SQL = """
items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
edges AS (
  SELECT a.item AS src, b.item AS dst
  FROM items a JOIN items b ON a.ok = b.ok AND a.item < b.item
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
"""


@query(
    "graph_component_sizes",
    f"""
    WITH {_W2_EDGES_SQL.strip().lstrip()}
    , sym AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    ),
    reach AS (
      WITH RECURSIVE r(node, label) AS (
        SELECT src, src FROM sym
        UNION
        SELECT s.dst, r.label FROM r JOIN sym s ON s.src = r.node
      ) SELECT node, MIN(label) AS cluster_id FROM r GROUP BY node
    ),
    comp AS (SELECT cluster_id, COUNT(*) AS size FROM reach GROUP BY 1)
    SELECT CAST(size AS BIGINT) AS size,
           CAST(COUNT(*) AS BIGINT) AS n_components
    FROM comp GROUP BY 1
    """,
)
def graph_component_sizes(spark, sf_dir):
    """Connected-component size distribution of the repeat
    co-purchase graph (edges = part pairs bought together in >= 2
    orders — the weight floor keeps one-off basket noise out, the
    same admission rule a product-affinity pipeline would use).
    Spark runs the min-label propagation loop from
    operators/dedup.connected_components (O(diameter) rounds, one
    join+agg each); the oracle computes the identical min-reachable-id
    labels with a recursive CTE."""
    from data_pipeline_001_spark.operators.dedup import connected_components

    edges = (
        _edges(spark, sf_dir)
        .where(F.col("weight") >= 2)
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    comp = connected_components(edges)
    return (
        comp.groupBy("cluster_id")
        .agg(F.count("*").alias("size"))
        .groupBy(F.col("size").cast("long").alias("size"))
        .agg(F.count("*").alias("n_components"))
    )


# Daily revenue in EXACT integer cents — the shared basis for the
# trend/rank statistics below: sign/rank decisions on BIGINTs cannot
# drift between engines the way raw double sums can (the CUSUM
# lesson).
_DAILY_CENTS_SQL = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
)
"""


def _daily_cents(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_c"),
        )
    )


@query(
    "stats_mann_kendall",
    f"""
    WITH {_DAILY_CENTS_SQL.strip().lstrip()}
    , s AS (
      SELECT SUM(CASE WHEN b.rev_c > a.rev_c THEN 1
                      WHEN b.rev_c < a.rev_c THEN -1 ELSE 0 END) AS s,
             (SELECT COUNT(*) FROM daily) AS n
      FROM daily a JOIN daily b ON b.day > a.day
    )
    SELECT CAST(s AS BIGINT) AS s_statistic,
           CAST(n AS BIGINT) AS n_days,
           ROUND((s - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
                 / SQRT(n * (n - 1.0) * (2 * n + 5) / 18.0), 6) AS z
    FROM s
    """,
)
def stats_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotonic-trend test on daily revenue:
    S = sum of sign(x_j - x_i) over day pairs i<j, normal
    approximation z with continuity correction (tie term omitted
    identically in both engines). Signs compare exact integer cents,
    so S is engine-exact. The pair join is calendar-bounded
    (~n_days^2 / 2 ~ 3M pairs at 2400 days) regardless of row volume —
    the day-grain aggregate is what scales, not the corpus."""
    daily = _daily_cents(spark, sf_dir)
    a = daily.select(F.col("day").alias("da"), F.col("rev_c").alias("ra"))
    b = daily.select(F.col("day").alias("db"), F.col("rev_c").alias("rb"))
    n_df = daily.agg(F.count("*").alias("n"))
    pairs = a.join(b, F.col("db") > F.col("da"))
    s_df = pairs.agg(
        F.sum(
            F.when(F.col("rb") > F.col("ra"), 1)
            .when(F.col("rb") < F.col("ra"), -1)
            .otherwise(0)
        ).alias("s")
    ).crossJoin(F.broadcast(n_df))
    sgn = (
        F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
    )
    return s_df.select(
        F.col("s").cast("long").alias("s_statistic"),
        F.col("n").cast("long").alias("n_days"),
        F.round(
            (F.col("s") - sgn)
            / F.sqrt(
                F.col("n") * (F.col("n") - F.lit(1.0))
                * (2 * F.col("n") + 5) / F.lit(18.0)
            ),
            6,
        ).alias("z"),
    )


@query(
    "stats_spearman_corr",
    f"""
    WITH {_DAILY_CENTS_SQL.strip().lstrip()}
    , ranked AS (
      SELECT RANK() OVER (ORDER BY cnt) +
             (COUNT(*) OVER (PARTITION BY cnt) - 1) / 2.0 AS r_cnt,
             RANK() OVER (ORDER BY rev_c) +
             (COUNT(*) OVER (PARTITION BY rev_c) - 1) / 2.0 AS r_rev
      FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CORR(r_cnt, r_rev), 6) AS spearman_rho
    FROM ranked
    """,
)
def stats_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between daily order count and daily
    revenue: Pearson correlation of AVERAGE ranks (min-rank + half
    the tie-group size — deterministic on the exact integer inputs,
    so both engines rank identically). Two window passes over the
    calendar-bounded day table; rho is the robust companion to the
    Pearson `stats_crosscorr_lags`."""
    from pyspark.sql import Window as W

    daily = _daily_cents(spark, sf_dir)
    r_cnt = F.rank().over(W.orderBy("cnt")) + (
        F.count("*").over(W.partitionBy("cnt")) - 1
    ) / F.lit(2.0)
    r_rev = F.rank().over(W.orderBy("rev_c")) + (
        F.count("*").over(W.partitionBy("rev_c")) - 1
    ) / F.lit(2.0)
    ranked = daily.select(r_cnt.alias("r_cnt"), r_rev.alias("r_rev"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.corr("r_cnt", "r_rev"), 6).alias("spearman_rho"),
    )


@query(
    "stats_runs_test",
    f"""
    WITH {_DAILY_CENTS_SQL.strip().lstrip()}
    , med AS (
      SELECT rev_c AS m FROM daily ORDER BY rev_c
      LIMIT 1 OFFSET ((SELECT COUNT(*) FROM daily) - 1) // 2
    ),
    flags AS (
      SELECT day, CASE WHEN rev_c > med.m THEN 1 ELSE 0 END AS above
      FROM daily CROSS JOIN med
    ),
    chg AS (
      SELECT above,
             CASE WHEN above <> LAG(above) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS changed
      FROM flags
    ),
    runs AS (
      SELECT SUM(changed) + 1 AS r,
             SUM(above) AS n1,
             SUM(1 - above) AS n2
      FROM chg
    )
    SELECT CAST(r AS BIGINT) AS n_runs,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6)
             AS z
    FROM runs
    """,
)
def stats_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test for randomness of daily revenue
    around its median: binarize each day (above the exact lower
    median of integer cents — ties count as below, identically in
    both engines), count sign runs with one lag window, and z-score
    against the runs-count null. Detects regime persistence the
    variance stats miss; one window pass over the day table.

    The median is ``percentile_disc(0.5)`` — the SQL-standard
    discrete percentile selects exactly the lower-median VALUE the
    oracle's ``LIMIT 1 OFFSET (n-1)//2`` does (round-8: replaced the
    rank-select row_number idiom so the broadcast build side is a
    zero-key aggregate the plan gate can prove bounded, instead of a
    single-partition global sort + point filter)."""
    from pyspark.sql import Window as W

    daily = _daily_cents(spark, sf_dir)
    med = daily.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY rev_c)")
        .cast("long")
        .alias("m")
    )
    flags = daily.crossJoin(F.broadcast(med)).select(
        "day", F.when(F.col("rev_c") > F.col("m"), 1).otherwise(0).alias("above")
    )
    w = W.orderBy("day")
    runs = flags.select(
        F.when(F.col("above") != F.lag("above").over(w), 1)
        .otherwise(0)
        .alias("chg"),
        "above",
    ).agg(
        (F.sum("chg") + 1).alias("r"),
        F.sum("above").alias("n1"),
        F.sum(1 - F.col("above")).alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + 1
    var = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - F.lit(1.0)))
    )
    return runs.select(
        r.cast("long").alias("n_runs"),
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        F.round((r - mu) / F.sqrt(var), 6).alias("z"),
    )


@query(
    "ml_feature_hashing",
    """
    WITH toks AS (
      SELECT unnest(string_split(p_name, ' ')) AS tok FROM part
    ),
    hashed AS (
      SELECT tok,
             (ascii(substr(md5(tok), 1, 1)) * 256
              + ascii(substr(md5(tok), 2, 1))) % 64 AS bucket
      FROM toks
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
    FROM hashed GROUP BY 1
    """,
)
def ml_feature_hashing(spark, sf_dir):
    """Hashing-trick feature buckets over part-name tokens (64
    buckets via the engine-portable md5-ascii hash) with per-bucket
    collision stats (distinct tokens sharing a bucket) — the load/
    collision profile that sizes a hashed feature space before
    training. Pure map-side expression plus one aggregate."""
    t = load_tables(spark, sf_dir)
    toks = t["part"].select(
        F.explode(F.split(F.col("p_name"), " ")).alias("tok")
    )
    bucket = (
        (
            F.ascii(F.substring(F.md5(F.col("tok")), 1, 1)) * 256
            + F.ascii(F.substring(F.md5(F.col("tok")), 2, 1))
        )
        % 64
    ).cast("int")
    return (
        toks.select("tok", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct_tokens"),
        )
    )


@query(
    "ml_scaler_params",
    """
    SELECT CAST(c_nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(AVG(c_acctbal), 6) AS mean_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 6) AS std_bal
    FROM customer GROUP BY 1
    """,
)
def ml_scaler_params(spark, sf_dir):
    """Per-group feature-scaling parameter table (min-max range +
    z-score mean/std per nation) — the fit() artifact of a
    normalizer; at 100 TB this is |groups| rows that broadcast back
    for the transform pass. One aggregate."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 6).alias("mean_bal"),
            F.round(F.stddev_samp("c_acctbal"), 6).alias("std_bal"),
        )
    )


@query(
    "ml_feature_crosses",
    """
    WITH binned AS (
      SELECT o_orderpriority,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
             o_totalprice
      FROM orders
    )
    SELECT o_orderpriority AS priority,
           CAST(decile AS INT) AS price_decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM binned GROUP BY 1, 2
    """,
)
def ml_feature_crosses(spark, sf_dir):
    """Crossed categorical x binned-numeric feature table
    (order priority x price decile) with per-cell support and target
    mean — the cross-feature audit that catches empty/starved cells
    before one-hot crossing explodes a model. Reuses the
    deterministic NTILE contract from `ml_quantile_binning`."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    w = W.orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.ntile(10).over(w).cast("int").alias("price_decile"),
            "o_totalprice",
        )
        .groupBy("priority", "price_decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
    )


# Wave 3 — model-evaluation harness over a deterministic rule score:
# score = exact order cents, positive label = fulfilled ('F'). The
# synthetic relationship is weak by design; what these pin is the
# EVALUATION math (confusion counts, rank-sum AUC, calibration), all
# computed distributed and engine-exact on integers.


@query(
    "ml_classifier_eval",
    """
    WITH scored AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score_c,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    med AS (
      SELECT score_c AS m FROM scored ORDER BY score_c
      LIMIT 1 OFFSET ((SELECT COUNT(*) FROM scored) - 1) // 2
    ),
    cm AS (
      SELECT SUM(CASE WHEN score_c > med.m AND y = 1 THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN score_c > med.m AND y = 0 THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN score_c <= med.m AND y = 1 THEN 1 ELSE 0 END) AS fn,
             SUM(CASE WHEN score_c <= med.m AND y = 0 THEN 1 ELSE 0 END) AS tn
      FROM scored CROSS JOIN med
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           ROUND(tp / CAST(tp + fp AS DOUBLE), 6) AS precision,
           ROUND(tp / CAST(tp + fn AS DOUBLE), 6) AS recall,
           ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1
    FROM cm
    """,
)
def ml_classifier_eval(spark, sf_dir):
    """Confusion matrix + precision/recall/F1 for the
    above-median-price rule predicting order fulfilment. Threshold is
    the exact lower median of integer cents (deterministic both
    engines); counts are one aggregate over the scored frame — the
    shape of every distributed model-eval job.

    Round-8 scale fix (caught by the hardened plan gate): the median
    over the FULL fact table was a single-partition global
    ``row_number`` — a genuine 100 TB killer. ``percentile_disc(0.5)``
    computes the identical lower-median value as a zero-key aggregate
    (partial-aggregated value→count map, memory bounded by distinct
    integer-cent scores, never a global sort) and is structurally
    provable for the broadcast build side."""
    t = load_tables(spark, sf_dir)
    scored = t["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_c"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    med = scored.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY score_c)")
        .cast("long")
        .alias("m")
    )
    pred = F.col("score_c") > F.col("m")
    cm = scored.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(pred & (F.col("y") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & (F.col("y") == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & (F.col("y") == 1), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred & (F.col("y") == 0), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        F.round(tp / (tp + fp).cast("double"), 6).alias("precision"),
        F.round(tp / (tp + fn).cast("double"), 6).alias("recall"),
        F.round(F.lit(2.0) * tp / (F.lit(2.0) * tp + fp + fn), 6).alias("f1"),
    )


@query(
    "ml_roc_auc",
    """
    WITH scored AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score_c,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    ranked AS (
      SELECT y,
             RANK() OVER (ORDER BY score_c) +
             (COUNT(*) OVER (PARTITION BY score_c) - 1) / 2.0 AS r
      FROM scored
    )
    SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(1 - y) AS BIGINT) AS n_neg,
           ROUND((SUM(CASE WHEN y = 1 THEN r ELSE 0 END)
                  - SUM(y) * (SUM(y) + 1) / 2.0)
                 / (SUM(y) * CAST(SUM(1 - y) AS DOUBLE)), 6) AS auc
    FROM ranked
    """,
)
def ml_roc_auc(spark, sf_dir):
    """Exact ROC AUC via the rank-sum (Mann-Whitney U) identity:
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos*n_neg) with average
    ranks for ties. One window pass + one aggregate — no threshold
    sweep, no per-point curve materialization — and ranks are
    deterministic on the exact integer-cents score, so AUC is
    engine-exact to the rounding. This is how AUC should be computed
    at 100 TB: a sort-based rank, not a quadratic pair count."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    scored = t["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_c"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    r = F.rank().over(W.orderBy("score_c")) + (
        F.count("*").over(W.partitionBy("score_c")) - 1
    ) / F.lit(2.0)
    ranked = scored.select("y", r.alias("r"))
    y = F.col("y")
    return ranked.agg(
        F.sum(y).cast("long").alias("n_pos"),
        F.sum(1 - y).cast("long").alias("n_neg"),
        F.round(
            (
                F.sum(F.when(y == 1, F.col("r")).otherwise(0.0))
                - F.sum(y) * (F.sum(y) + 1) / F.lit(2.0)
            )
            / (F.sum(y) * F.sum(1 - y).cast("double")),
            6,
        ).alias("auc"),
    )


@query(
    "ml_calibration_bins",
    """
    WITH scored AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score_c,
             o_orderkey,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    binned AS (
      SELECT y, score_c,
             NTILE(10) OVER (ORDER BY score_c, o_orderkey) AS bin
      FROM scored
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CAST(score_c AS DOUBLE)) / 100.0, 6) AS avg_score,
           ROUND(AVG(CAST(y AS DOUBLE)), 6) AS event_rate
    FROM binned GROUP BY 1
    """,
)
def ml_calibration_bins(spark, sf_dir):
    """Reliability (calibration) table: score deciles vs observed
    event rate — the distributed form of a calibration curve.
    Deterministic NTILE on (exact cents, key); per-bin means only."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    scored = t["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_c"),
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    w = W.orderBy("score_c", "o_orderkey")
    return (
        scored.select("y", "score_c", F.ntile(10).over(w).alias("bin"))
        .groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("score_c").cast("double")) / 100.0, 6).alias(
                "avg_score"
            ),
            F.round(F.avg(F.col("y").cast("double")), 6).alias("event_rate"),
        )
    )


@query(
    "stats_abc_analysis",
    """
    WITH part_rev AS (
      SELECT l_partkey,
             CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100)
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(rev_c) AS total FROM part_rev),
    ranked AS (
      SELECT l_partkey, rev_c,
             SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey) AS cum_c,
             tot.total
      FROM part_rev CROSS JOIN tot
    ),
    classed AS (
      SELECT CASE WHEN cum_c * 5 <= total * 4 THEN 'A'
                  WHEN cum_c * 20 <= total * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_c
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(rev_c) / 100.0, 2) AS revenue,
           ROUND(SUM(CAST(rev_c AS DOUBLE))
                 / (SELECT CAST(total AS DOUBLE) FROM tot), 6) AS rev_share
    FROM classed GROUP BY 1
    """,
)
def stats_abc_analysis(spark, sf_dir):
    """ABC (Pareto-class) inventory analysis: parts ranked by
    discounted revenue; A = parts inside the first 80% of cumulative
    revenue, B = next 15%, C = tail. Class boundaries compare SCALED
    INTEGERS (cum*5 <= total*4 for 0.8, cum*20 <= total*19 for 0.95)
    so no float share ever decides a class. One aggregate + one
    window over the |parts|-row rollup — the fact table never sorts."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    part_rev = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * 100
            )
            .cast("long")
            .alias("rev_c")
        )
    )
    tot = part_rev.agg(F.sum("rev_c").alias("total"))
    w = W.orderBy(F.col("rev_c").desc(), F.col("l_partkey"))
    ranked = part_rev.crossJoin(F.broadcast(tot)).select(
        "rev_c", F.sum("rev_c").over(w).alias("cum_c"), "total"
    )
    abc = (
        F.when(F.col("cum_c") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum_c") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
    )
    classed = ranked.select(abc.alias("abc_class"), "rev_c", "total")
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.round(F.sum("rev_c") / F.lit(100.0), 2).alias("revenue"),
        F.round(
            F.sum(F.col("rev_c").cast("double")) / F.first("total").cast("double"), 6
        ).alias("rev_share"),
    )


def _markov_oracle_sql(iterations: int = 6) -> str:
    """Chained-CTE power iteration for the stationary distribution of
    the event-type Markov chain (same generated-oracle pattern as
    `graph_pagerank_top`): transition probabilities are exact integer
    ratios, every step rounds to 8 decimals, so the trajectory is
    engine-exact."""
    head = """
WITH seq AS (SELECT event_type AS src,
                    LEAD(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS dst
             FROM events WHERE user_id IS NOT NULL),
t AS (SELECT src, dst, COUNT(*) AS n FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst),
tot AS (SELECT src, SUM(n) AS rt FROM t GROUP BY src),
trans AS (SELECT t.src, t.dst, t.n / CAST(tot.rt AS DOUBLE) AS p
          FROM t JOIN tot USING (src)),
states AS (SELECT src AS state FROM tot),
nn AS (SELECT COUNT(*) AS n FROM states),
pi0 AS (SELECT state, ROUND(1.0 / nn.n, 8) AS pi FROM states CROSS JOIN nn)
"""
    steps = []
    for k in range(1, iterations + 1):
        steps.append(f"""
pi{k} AS (
  SELECT tr.dst AS state, ROUND(SUM(p.pi * tr.p), 8) AS pi
  FROM trans tr JOIN pi{k - 1} p ON p.state = tr.src
  GROUP BY tr.dst
)""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
SELECT state, ROUND(pi, 6) AS pi FROM pi{iterations}
"""
    )


@query("stats_markov_stationary", _markov_oracle_sql(6))
def stats_markov_stationary(spark, sf_dir):
    """Stationary distribution of the first-order event-type Markov
    chain (6 synchronous power steps over the exact-integer-ratio
    transition matrix from `window_event_transitions`): the long-run
    share of each event type implied by observed transitions — the
    behavioral equilibrium a session simulator samples from. The
    matrix is |event types|² cells however large the corpus, so after
    the one LEAD window + count shuffle, iteration cost is
    independent of data volume; per-step round-8 makes the trajectory
    cross-engine exact (the PageRank discipline)."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    counts = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    totals = counts.groupBy("src").agg(F.sum("n").alias("rt"))
    trans = counts.join(totals, "src").select(
        "src", "dst", (F.col("n") / F.col("rt").cast("double")).alias("p")
    )
    states = totals.select(F.col("src").alias("state"))
    # bounded collect: the state count (|event types|) as a literal so
    # the uniform start rounds identically in both engines
    n = states.count()
    pi = states.select(
        "state", F.round(F.lit(1.0) / F.lit(n), 8).alias("pi")
    )
    for _ in range(6):
        pi = (
            trans.join(pi, trans["src"] == pi["state"])
            .groupBy("dst")
            .agg(F.round(F.sum(F.col("pi") * F.col("p")), 8).alias("pi"))
            .select(F.col("dst").alias("state"), "pi")
        )
    return pi.select("state", F.round("pi", 6).alias("pi"))
