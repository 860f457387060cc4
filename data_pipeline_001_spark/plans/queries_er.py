"""Round-6 extension wave: entity resolution, ranking evaluation,
audio spectral analysis, and robust trend estimation.

Four surfaces a training-data platform grows after the round-5 state
(SURVEY.md §2.13 scope; nearest reference surface is the record
matching in `pipeline_utils/documents_utils.py` — exact keys only):

* ``er_customer_entities`` — the full entity-resolution PIPELINE
  (blocking → candidate pairs → transitive closure → canonical
  entities), composing the deletion-neighborhood fuzzy join with
  min-label connected components.
* ``ml_ndcg_ranking`` — NDCG@10 ranking evaluation, completing the
  model-eval harness (confusion/F1, ROC AUC, calibration) with the
  graded-relevance metric search and recommender pipelines report.
* ``multimodal_wav_spectrum`` — frequency-domain features over the
  binary audio column (NumPy rfft in Arrow batches): the planted
  bin-aligned tone makes the dominant bin a closed-form oracle.
* ``stats_theil_sen`` — Theil–Sen robust slope over the daily revenue
  series, joining the integer-cents trend family (CUSUM,
  Mann-Kendall) with the estimator that tolerates up to ~29% outliers.

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
# Entity resolution: blocking -> pairs -> components -> entities
# ---------------------------------------------------------------------

# Planted-variant corpus: every customer record keyed by md5(c_name)
# (32 lowercase hex chars — sequential TPC-H names would otherwise be
# natural edit-1 neighbors and fuse the whole table into one cluster);
# every 37th customer gains a 1-substitution variant ('z' prefix, 'z'
# is outside the hex alphabet so variants can never collide with base
# keys), every 111th additionally a 2nd-degree variant at distance 1
# from the first and 2 from the base — clusters of size 3 that only a
# TRANSITIVE closure links. Offsets are 1e12 (far above any c_custkey
# at any TPC-H scale factor, where custkey ≈ 150k·SF).
_ER_OFF_B = 1_000_000_000_000
_ER_OFF_C = 2_000_000_000_000

_ER_ORACLE = f"""
WITH recs AS (
  SELECT c_custkey AS record_id, md5(c_name) AS key FROM customer
  UNION ALL
  SELECT c_custkey + {_ER_OFF_B}, 'z' || substr(md5(c_name), 2, 31)
  FROM customer WHERE c_custkey % 37 = 0
  UNION ALL
  SELECT c_custkey + {_ER_OFF_C}, 'zz' || substr(md5(c_name), 3, 30)
  FROM customer WHERE c_custkey % 111 = 0
),
del AS (
  SELECT r.record_id, r.key, t.i,
         substr(r.key, 1, CAST(t.i AS INT) - 1)
           || substr(r.key, CAST(t.i AS INT) + 1, 32 - CAST(t.i AS INT))
           AS dkey
  FROM recs r, range(1, 33) t(i)
),
edges AS (
  -- all keys are length 32, so levenshtein = 1 is exactly "same
  -- single-position deletion matches": the FastSS blocking is exact
  SELECT x.record_id AS src, y.record_id AS dst
  FROM del x JOIN del y ON x.i = y.i AND x.dkey = y.dkey
  WHERE x.key <> y.key
),
reach AS (
  WITH RECURSIVE r(node, label) AS (
    SELECT record_id, record_id FROM recs
    UNION
    SELECT e.dst, r.label FROM r JOIN edges e ON e.src = r.node
  ) SELECT node, MIN(label) AS entity_id FROM r GROUP BY node
),
sizes AS (
  SELECT entity_id, COUNT(*) AS n FROM reach GROUP BY entity_id
)
SELECT c.node AS record_id, c.entity_id,
       CAST(s.n AS BIGINT) AS cluster_size
FROM reach c JOIN sizes s USING (entity_id)
"""


@query("er_customer_entities", _ER_ORACLE)
def er_customer_entities(spark, sf_dir):
    """End-to-end entity resolution: deletion-neighborhood blocking
    (``operators/fuzzy_join.editdist1_pairs`` — O(n·L) candidates,
    one equi-join, never the n² cross product) finds edit-distance-1
    record pairs, min-label propagation
    (``operators/dedup.connected_components``, O(diameter) rounds)
    closes them transitively, and every record maps to its canonical
    entity (min record id) with the cluster size. Singleton records
    never enter the edge join — they rejoin as their own entity via
    one left join at the end. The DuckDB oracle derives the identical
    edges from the same deletion blocking (exact for k=1 on
    equal-length keys) and closes them with a recursive CTE."""
    from data_pipeline_001_spark.operators.dedup import connected_components
    from data_pipeline_001_spark.operators.fuzzy_join import editdist1_pairs

    t = load_tables(spark, sf_dir)
    c = t["customer"]
    key = F.md5("c_name")
    base = c.select(F.col("c_custkey").alias("record_id"), key.alias("key"))
    var_b = c.where(F.col("c_custkey") % 37 == 0).select(
        (F.col("c_custkey") + F.lit(_ER_OFF_B)).alias("record_id"),
        F.concat(F.lit("z"), F.expr("substring(md5(c_name), 2, 31)")).alias("key"),
    )
    var_c = c.where(F.col("c_custkey") % 111 == 0).select(
        (F.col("c_custkey") + F.lit(_ER_OFF_C)).alias("record_id"),
        F.concat(F.lit("zz"), F.expr("substring(md5(c_name), 3, 30)")).alias("key"),
    )
    recs = base.unionByName(var_b).unionByName(var_c)

    pairs = editdist1_pairs(recs, "key", out_a="key_a", out_b="key_b")
    # keys are unique per record (md5 of distinct names; variants are
    # prefix-disjoint from base keys), so key->id is a 1:1 join
    ids = recs.select(F.col("key").alias("k"), F.col("record_id").alias("rid"))
    id_pairs = (
        pairs.join(ids.withColumnsRenamed({"k": "key_a", "rid": "id_a"}), "key_a")
        .join(ids.withColumnsRenamed({"k": "key_b", "rid": "id_b"}), "key_b")
        .select("id_a", "id_b")
    )
    comp = connected_components(id_pairs, "id_a", "id_b")
    labeled = recs.join(
        comp, recs.record_id == comp.doc_id, "left"
    ).select(
        "record_id",
        F.coalesce("cluster_id", "record_id").alias("entity_id"),
    )
    sizes = labeled.groupBy("entity_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return labeled.join(sizes, "entity_id").select(
        "record_id", "entity_id", "cluster_size"
    )


# ---------------------------------------------------------------------
# NDCG@10 ranking evaluation
# ---------------------------------------------------------------------

_NDCG_K = 10

_NDCG_ORACLE = f"""
WITH rel AS (
  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
         LEAST(COUNT(o.o_orderkey), 5) AS rel
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
),
ranked AS (
  SELECT c_nationkey, rel,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS r,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY rel DESC, c_custkey ASC) AS ir
  FROM rel
),
g AS (
  SELECT c_nationkey,
         SUM(CASE WHEN r <= {_NDCG_K}
             THEN (POWER(2, rel) - 1) / LOG2(r + 1) ELSE 0 END) AS dcg,
         SUM(CASE WHEN ir <= {_NDCG_K}
             THEN (POWER(2, rel) - 1) / LOG2(ir + 1) ELSE 0 END) AS idcg,
         COUNT(*) AS n_candidates
  FROM ranked GROUP BY c_nationkey
)
SELECT g.c_nationkey AS nationkey, n.n_name,
       ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
       CASE WHEN idcg > 0 THEN ROUND(dcg / idcg, 6) END AS ndcg,
       CAST(n_candidates AS BIGINT) AS n_candidates
FROM g JOIN nation n ON n.n_nationkey = g.c_nationkey
"""


@query("ml_ndcg_ranking", _NDCG_ORACLE)
def ml_ndcg_ranking(spark, sf_dir):
    """NDCG@10 per query group (nation): account balance is the
    model's ranking score, graded relevance is the customer's order
    count capped at 5 (the usual 0-5 judgment scale), and the metric
    is the classic (2^rel - 1)/log2(rank+1) gain against the ideal
    ordering. Completes the model-evaluation harness (confusion/F1,
    ROC AUC, calibration deciles) with the ranking-quality metric.
    Two window ranks over one aggregated frame, then one group-agg —
    the per-group top-k never leaves the JVM. Deterministic: both
    rank orders carry a custkey tiebreak, and ties in ``rel`` cannot
    change the ideal DCG (equal gains at the swapped positions)."""
    t = load_tables(spark, sf_dir)
    rel = (
        t["customer"]
        .join(
            t["orders"].select(
                F.col("o_custkey").alias("c_custkey"), "o_orderkey"
            ),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(F.least(F.count("o_orderkey"), F.lit(5)).alias("rel"))
    )
    w_score = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_ideal = Window.partitionBy("c_nationkey").orderBy(
        F.col("rel").desc(), F.col("c_custkey").asc()
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1.0
    ranked = rel.select(
        "c_nationkey",
        "rel",
        F.row_number().over(w_score).alias("r"),
        F.row_number().over(w_ideal).alias("ir"),
    )
    g = ranked.groupBy("c_nationkey").agg(
        F.sum(
            F.when(F.col("r") <= _NDCG_K, gain / F.log2(F.col("r") + 1)).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(F.col("ir") <= _NDCG_K, gain / F.log2(F.col("ir") + 1)).otherwise(0.0)
        ).alias("idcg"),
        F.count("*").cast("long").alias("n_candidates"),
    )
    nation = t["nation"].select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return g.join(F.broadcast(nation), "c_nationkey").select(
        F.col("c_nationkey").alias("nationkey"),
        "n_name",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.when(F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)).alias(
            "ndcg"
        ),
        "n_candidates",
    )


# ---------------------------------------------------------------------
# Audio spectral features over the binary media column
# ---------------------------------------------------------------------

_SPECTRUM_ORACLE = """
SELECT doc_id AS media_id,
       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
       CAST(512 AS BIGINT) AS n_samples,
       CAST(3 + doc_id % 40 AS BIGINT) AS dominant_bin,
       (3 + doc_id % 40) * (8000 + (doc_id % 3) * 4000) / 512.0
         AS dominant_hz
FROM documents
"""


@query("multimodal_wav_spectrum", _SPECTRUM_ORACLE)
def multimodal_wav_spectrum(spark, sf_dir):
    """Frequency-domain audio analysis end-to-end: build a bin-aligned
    512-sample tone per document (WAV bytes, executor-side), decode and
    rfft it with NumPy inside ``mapInPandas`` (no shuffle), emit the
    dominant DFT bin and its frequency. The planted tone sits exactly
    on bin 3 + doc_id % 40, so the oracle predicts the decoded spectrum
    peak analytically — a green hash proves the RIFF walk, the PCM
    unpack, and the FFT peak-pick all ran correctly on every payload.
    ``spectral_centroid_hz`` has no closed form (quantization noise
    shifts it ~0.3%) and is pytest-verified instead.

    Round-11 (guide §4.2/§4.5): the tone payload is a pure function
    of ``doc_id % 120`` (40 bins × 3 rates), so the synth memoizes
    per task on that key — each distinct payload is still built by
    the REAL ``make_tone_wav`` (bit-identical by construction; this
    is per-task memoization of a deterministic builder, not cross-run
    caching — the decode side still walks every payload). A
    round-robin repartition to the core count fixes the single-file
    scan serializing both Python stages through one worker, and the
    decode+FFT side is batched in `spectral_features`. Measured
    11.7 → 1.0 s at sf1 (same-session best-of-3, identical 50k rows)."""
    import pandas as pd

    from data_pipeline_001_spark.operators.multimodal import (
        make_tone_wav,
        spectral_features,
    )

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)

    def build(batches):
        cache = {}
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                key = int(d) % 120
                p = cache.get(key)
                if p is None:
                    p = cache[key] = make_tone_wav(int(d))
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return spectral_features(media).select(
        "media_id", "sample_rate", "n_samples", "dominant_bin", "dominant_hz"
    )


# ---------------------------------------------------------------------
# Theil-Sen robust slope over the daily revenue series
# ---------------------------------------------------------------------

_THEIL_SEN_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CAST(b.rev_c - a.rev_c AS DOUBLE)
           / datediff('day', a.day, b.day) AS slope
  FROM daily a JOIN daily b ON a.day < b.day
),
s AS (SELECT quantile_cont(slope, 0.5) AS slope FROM pairs),
i AS (
  SELECT quantile_cont(d.rev_c - s.slope * datediff('day', DATE '1992-01-01', d.day), 0.5)
           AS intercept_c
  FROM daily d CROSS JOIN s
)
SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
       CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_pairs,
       ROUND(s.slope, 6) AS slope_cents_per_day,
       ROUND(i.intercept_c, 6) AS intercept_cents
FROM s CROSS JOIN i
"""


@query("stats_theil_sen", _THEIL_SEN_ORACLE)
def stats_theil_sen(spark, sf_dir):
    """Theil–Sen estimator on daily revenue: the median of all
    pairwise slopes (robust to ~29% outliers, vs OLS's zero breakdown
    point), with the companion median intercept anchored at
    1992-01-01. Integer-cents basis like the rest of the trend family
    (CUSUM, Mann-Kendall): slope NUMERATORS are exact BIGINTs, so the
    pair multiset is bit-identical across engines and the median
    interpolation agrees. The daily spine is bounded (~2.4k days at
    ANY scale factor — TPC-H's 7-year date range is sf-invariant), so
    the O(days²) pair frame is a ~3M-row constant, not a scale risk;
    the corpus-sized orders scan reduces to the spine in one groupBy."""
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
    a = daily.select(F.col("day").alias("day_a"), F.col("rev_c").alias("rev_a"))
    b = daily.select(F.col("day").alias("day_b"), F.col("rev_c").alias("rev_b"))
    pairs = a.join(b, F.col("day_a") < F.col("day_b")).select(
        (
            (F.col("rev_b") - F.col("rev_a")).cast("double")
            / F.datediff("day_b", "day_a")
        ).alias("slope")
    )
    # round-11: the builtin exact percentile built a value→count hash
    # map over all ~2.9M mostly-distinct slopes and merged it
    # single-threaded — 10.4 s of the query's 14.4 s at sf1. Rank
    # selection (operators/quantiles.exact_quantiles) computes the
    # SAME interpolated median through codegen sort/window operators:
    # measured 4.5 s for the whole pairs→median pipeline, result
    # bit-identical (asserted in tests + the unchanged oracle hash).
    # The intercept percentile below stays builtin: its input is the
    # bounded ~2.4k-row daily spine, where the hash map is trivial.
    from data_pipeline_001_spark.operators.quantiles import exact_quantiles

    # filter_nulls=False: slope is non-null by construction
    # (datediff > 0 on every joined row), and the generic null filter
    # would be pushed into the BNLJ condition, evaluating the division
    # on day_a == day_b candidates — an ANSI divide-by-zero on rows
    # the join itself rejects.
    s = exact_quantiles(
        pairs, "slope", [0.5], ["slope"], filter_nulls=False
    ).select("slope", F.col("n").alias("n_pairs"))
    anchored = daily.crossJoin(F.broadcast(s)).select(
        "slope",
        "n_pairs",
        (
            F.col("rev_c")
            - F.col("slope") * F.datediff("day", F.lit("1992-01-01").cast("date"))
        ).alias("resid"),
    )
    return anchored.groupBy("slope", "n_pairs").agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr("percentile(resid, 0.5)").alias("intercept_c"),
    ).select(
        "n_days",
        "n_pairs",
        F.round("slope", 6).alias("slope_cents_per_day"),
        F.round("intercept_c", 6).alias("intercept_cents"),
    )
