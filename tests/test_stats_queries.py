"""Property tests for the statistical-profiling query batch
(stats_corr_matrix, stats_mad_outliers, itemset_part_pairs,
stats_mutual_information, text_pmi_bigrams). Cross-engine value
parity is covered by the DuckDB oracle gate; these assert the
mathematical invariants on the sf0.001 tables plus planted-data
sanity checks that the oracle cannot express."""

import math

from tests.conftest import SF_DIR


def test_corr_matrix_bounds_and_shape(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        _CORR_COLS,
        stats_corr_matrix,
    )

    rows = stats_corr_matrix(spark, SF_DIR).collect()
    n = len(_CORR_COLS)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert -1.0 <= r.corr_r <= 1.0
        assert r.x_col < r.y_col  # upper triangle, no self-pairs
    # planted linear relation: corr(x, 3x+1) == 1, corr(x, -x) == -1
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 3 + 1).cast("double").alias("y"),
        (-F.col("id")).cast("double").alias("z"),
    )
    got = df.agg(
        F.round(F.corr("x", "y"), 6).alias("xy"),
        F.round(F.corr("x", "z"), 6).alias("xz"),
    ).collect()[0]
    assert got.xy == 1.0 and got.xz == -1.0


def test_mad_outliers_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        stats_mad_outliers,
    )

    r = stats_mad_outliers(spark, SF_DIR).collect()[0]
    assert r.n_days > 0
    assert r.mad_rev >= 0.0
    assert 0 <= r.n_outlier_days <= r.n_days
    # MAD is a lower bound-ish spread: median must sit inside the data
    assert r.med_rev > 0.0


def test_mad_flags_planted_spike(spark):
    """A flat series with one huge spike: exactly the spike is an
    outlier under the 3.5 modified-z cutoff."""
    import pandas as pd

    from data_pipeline_001_spark.plans import queries_mlprep as m

    # 30 flat days of ~100 revenue, one day of 10_000
    rows = [(f"2024-01-{d:02d}T12:00:00", "purchase", 100.0 + (d % 3))
            for d in range(1, 31)]
    rows.append(("2024-02-01T12:00:00", "purchase", 10_000.0))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "event_type", "value"])
    ).selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value",
        "CAST(1 AS BIGINT) AS event_id",
        "CAST(1 AS BIGINT) AS user_id", "'{}' AS props",
    )
    df.createOrReplaceTempView("_mad_events")

    # run the same logic inline against the planted frame
    from pyspark.sql import functions as F

    daily = (
        df.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.round(F.sum("value"), 6).alias("rev"))
    )
    med = daily.agg(
        F.round(F.expr("percentile(rev, 0.5)"), 6).alias("med_rev")
    )
    dev = daily.crossJoin(F.broadcast(med)).select(
        F.round(F.abs(F.col("rev") - F.col("med_rev")), 6).alias("adev")
    )
    mad = dev.agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad_rev")
    ).collect()[0].mad_rev
    n_out = dev.where(
        F.col("adev") > F.round(F.lit(mad * 3.5 / 0.6745), 6)
    ).count()
    assert n_out == 1


def test_itemset_pairs_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        itemset_part_pairs,
    )

    rows = itemset_part_pairs(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    cnts = [r.pair_cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert r.p1 < r.p2
        assert 0.0 < r.support <= 1.0
        assert r.lift > 0.0


def test_mutual_information_bounds(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        stats_mutual_information,
    )

    r = stats_mutual_information(spark, SF_DIR).collect()[0]
    eps = 1e-5  # both sides rounded to 6 decimals
    assert r.mi_nats >= -eps  # MI is non-negative
    assert r.h_lang >= -eps and r.h_source >= -eps
    # MI <= min(H(X), H(Y)) — the standard information inequality
    assert r.mi_nats <= min(r.h_lang, r.h_source) + eps
    # entropies bounded by log of support size
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_lang = docs.select("lang").distinct().count()
    n_src = docs.select("source").distinct().count()
    assert r.h_lang <= math.log(n_lang) + eps
    assert r.h_source <= math.log(n_src) + eps


def test_pmi_bigrams_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        text_pmi_bigrams,
    )

    rows = text_pmi_bigrams(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 15
    cnts = [r.c_xy for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert r.c_xy >= 1
        # PMI of an observed bigram is bounded above by
        # ln(n_uni^2 / n_bi) in the degenerate all-mass case; just
        # sanity-check it is finite
        assert math.isfinite(r.pmi)


def test_bounce_rate_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        events_bounce_rate,
    )

    rows = events_bounce_rate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert 0.0 <= r.bounce_rate <= 1.0
    # sessions can't exceed events on the day they start
    total_sessions = sum(r.n_sessions for r in rows)
    n_events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where("user_id IS NOT NULL")
        .count()
    )
    assert 0 < total_sessions <= n_events


def test_bounce_sessionization_planted(spark):
    """One user, three events: two 5 min apart (one session), one 2 h
    later (bounce session). Expect 2 sessions, 1 bounce."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1),
            (2, "2024-01-01 10:05:00", 1),
            (3, "2024-01-01 12:30:00", 1),
        ],
        "event_id long, ts string, user_id long",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = df.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w_ord).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w_ord))
                > 1800
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_s"),
    ).select("user_id", F.sum("new_s").over(w_run).alias("sid"))
    per = sess.groupBy("user_id", "sid").count().collect()
    counts = sorted(r["count"] for r in per)
    assert counts == [1, 2]


def test_chi_squared_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        stats_chi_squared,
        stats_mutual_information,
    )

    r = stats_chi_squared(spark, SF_DIR).collect()[0]
    assert r.chi2 >= -1e-5
    assert r.dof >= 1
    assert -1e-5 <= r.cramers_v <= 1.0 + 1e-5
    # consistency with the MI view of the same contingency: both zero
    # together (independence) or both positive
    mi = stats_mutual_information(spark, SF_DIR).collect()[0]
    assert (r.chi2 < 1e-4) == (abs(mi.mi_nats) < 1e-7)


def test_pareto_share_monotone(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        agg_pareto_share,
    )

    r = agg_pareto_share(spark, SF_DIR).collect()[0]
    assert r.n_customers > 0
    # shares are nested prefixes of the same descending cumsum
    assert 0.0 < r.share_top1 <= r.share_top10 <= r.share_top20 <= 1.0
    # top-k% must contribute at least k% of revenue when sorted desc
    assert r.share_top10 >= 0.10 - 1e-6
    assert r.share_top20 >= 0.20 - 1e-6


def test_hapax_ratio_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        text_hapax_ratio,
    )

    rows = text_hapax_ratio(spark, SF_DIR).collect()
    assert rows
    langs = [r.lang for r in rows]
    assert langs == sorted(langs)
    for r in rows:
        assert 0 < r.vocab <= r.n_tokens
        assert 0 <= r.hapax <= r.vocab
        assert 0.0 <= r.hapax_ratio <= 1.0
        assert 0.0 < r.type_token_ratio <= 1.0


def test_ks_statistic_bounds_and_planted(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.plans.queries_mlprep import (
        stats_ks_test,
    )

    r = stats_ks_test(spark, SF_DIR).collect()[0]
    assert r.n_purchase > 0 and r.n_click > 0
    assert 0.0 <= r.ks_d <= 1.0
    # planted: identical samples → D == 0; disjoint supports → D == 1
    same = spark.createDataFrame(
        [(float(v), g) for v in range(10) for g in ("a", "b")],
        "value double, grp string",
    )
    disjoint = spark.createDataFrame(
        [(float(v), "a") for v in range(10)]
        + [(float(v + 100), "b") for v in range(10)],
        "value double, grp string",
    )

    def ks(df):
        pv = df.groupBy("value").agg(
            F.sum(F.when(F.col("grp") == "a", 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("grp") == "b", 1).otherwise(0)).alias("c2"),
        )
        w = Window.orderBy("value").rowsBetween(
            Window.unboundedPreceding, 0
        )
        cdf = pv.select(
            F.sum("c1").over(w).alias("cum1"),
            F.sum("c2").over(w).alias("cum2"),
            F.sum("c1").over(Window.partitionBy()).alias("n1"),
            F.sum("c2").over(Window.partitionBy()).alias("n2"),
        )
        return cdf.agg(
            F.max(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
            ).alias("d")
        ).collect()[0].d

    assert ks(same) == 0.0
    assert ks(disjoint) == 1.0


def test_monthly_growth_window_math(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        time_monthly_growth,
    )

    rows = time_monthly_growth(spark, SF_DIR).collect()
    assert len(rows) > 2
    assert rows[0].mom_growth_pct is None  # no prior month
    # spot-check the lag arithmetic on the first valid pair
    r0, r1 = rows[0], rows[1]
    expect = round(100.0 * (r1.rev - r0.rev) / r0.rev, 6)
    assert abs(r1.mom_growth_pct - expect) < 1e-6
    # ma3 of the first row is the row itself
    assert abs(rows[0].ma3 - rows[0].rev) < 1e-6


def test_trigram_coverage_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        text_trigram_coverage,
    )

    rows = text_trigram_coverage(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.distinct_trigrams <= r.n_trigrams
        assert 0.0 < r.top100_coverage <= 1.0
        # if a language has <=100 distinct trigrams, coverage is total
        if r.distinct_trigrams <= 100:
            assert r.top100_coverage == 1.0


def test_jackknife_se_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        stats_jackknife_se,
    )

    r = stats_jackknife_se(spark, SF_DIR).collect()[0]
    assert r.n_groups == 10
    assert r.jackknife_se >= 0.0
    assert r.mean_price > 0.0
    # jackknife SE of a mean should be within an order of magnitude
    # of the classical SE = sd / sqrt(n)
    import math

    stats = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .selectExpr(
            "stddev_samp(o_totalprice) AS sd", "count(*) AS n"
        )
        .collect()[0]
    )
    classical = stats.sd / math.sqrt(stats.n)
    assert classical / 10 < r.jackknife_se < classical * 10


def test_readability_prose_range(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        text_readability,
    )

    rows = text_readability(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0
        assert r.avg_words_per_sent > 0.0
        # every word has at least ~one vowel group in natural text
        assert 0.2 < r.avg_sylls_per_word < 10.0
        # Flesch is unbounded in theory but sane corpora sit in
        # roughly [-200, 206.835]
        assert -500.0 < r.flesch_ease <= 206.835


def test_new_vs_returning_accounting(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        events_new_vs_returning,
    )

    rows = events_new_vs_returning(spark, SF_DIR).collect()
    assert rows
    # day 1: everyone is new; decomposition always sums
    assert rows[0].n_new == rows[0].n_active
    for r in rows:
        assert r.n_new + r.n_returning == r.n_active
        assert 0.0 <= r.pct_new <= 1.0
    # total new across all days == number of distinct users
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where("user_id IS NOT NULL")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_new for r in rows) == n_users


def test_welch_ttest_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        stats_welch_ttest,
    )

    r = stats_welch_ttest(spark, SF_DIR).collect()[0]
    assert r.n_a > 1 and r.n_b > 1
    import math

    assert math.isfinite(r.welch_t)
    # Welch dof is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert min(r.n_a, r.n_b) - 1 <= r.welch_dof + 1e-6
    assert r.welch_dof <= r.n_a + r.n_b - 2 + 1e-6
    # hash arms on the same corpus: means should be same order of
    # magnitude (sanity that assignment isn't degenerate)
    assert r.mean_a > 0 and r.mean_b > 0


def test_hhi_bounds(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        agg_hhi_concentration,
    )

    rows = agg_hhi_concentration(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # HHI of n equal shares is 1/n; monopoly is 1
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-6


def test_session_duration_consistency(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        events_bounce_rate,
        events_session_duration,
    )

    d = events_session_duration(spark, SF_DIR).collect()[0]
    assert d.n_sessions > 0
    assert 0.0 <= d.p50_duration_s <= d.p90_duration_s <= d.max_duration_s
    assert d.avg_events >= 1.0
    # same sessionizer: session counts must agree with the bounce query
    total = sum(
        r.n_sessions for r in events_bounce_rate(spark, SF_DIR).collect()
    )
    assert total == d.n_sessions


def test_anova_f_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        stats_anova_weekday,
    )

    r = stats_anova_weekday(spark, SF_DIR).collect()[0]
    assert r.k_groups <= 7
    assert r.n_days >= r.k_groups
    assert r.f_stat >= 0.0


def test_load_imbalance_invariants(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        events_load_imbalance,
    )

    r = events_load_imbalance(spark, SF_DIR).collect()[0]
    assert r.n_hours > 0
    assert r.mean_per_hour > 0.0
    assert r.cv >= 0.0
    assert r.peak_to_mean >= 1.0
    assert r.peak_to_trough >= r.peak_to_mean


def test_status_aging_accounting(spark):
    from data_pipeline_001_spark.plans.queries_mlprep import (
        orders_status_aging,
    )

    rows = orders_status_aging(spark, SF_DIR).collect()
    assert rows
    valid = {"0-30", "31-90", "91-365", "365+"}
    assert all(r.age_bucket in valid for r in rows)
    # cell counts sum to the table row count
    n = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n
