"""Third-wave curation operators: fuzzy edit-distance join exactness
vs a brute-force reference, SCD1 merge semantics + idempotence,
Gopher rule flags on crafted documents, classifier-score equivalence
to a hashlib recomputation, source quota caps, and a planted split
leak."""

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_matches_bruteforce(spark):
    from data_pipeline_001_spark.operators.fuzzy_join import editdist1_pairs

    vals = [
        "abc", "abd", "ab", "abcd", "xyz", "xxyz", "a", "b", "",
        "hello", "hallo", "hell", "shell",
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["name"])
    got = {
        (r["name_a"], r["name_b"])
        for r in editdist1_pairs(df, "name").collect()
    }
    want = {
        tuple(sorted((u, v)))
        for u, v in itertools.combinations(sorted(set(vals)), 2)
        if _lev(u, v) == 1
    }
    # ("", "a") and ("", "b") are distance-1 pairs via the indel probe
    assert ("", "a") in want
    assert got == want


def test_fuzzy_join_empty_and_no_self_pairs(spark):
    from data_pipeline_001_spark.operators.fuzzy_join import editdist1_pairs

    df = spark.createDataFrame([("same",), ("same",), ("far",)], ["name"])
    rows = editdist1_pairs(df, "name").collect()
    # duplicates of the same value are NOT distance-1 pairs
    assert rows == []


def test_merge_upsert_semantics_and_idempotence(spark):
    from data_pipeline_001_spark.operators.relational import merge_upsert

    target = spark.createDataFrame(
        [(1, 10.0, "target"), (2, 20.0, "target"), (3, 30.0, "target")],
        ["k", "v", "src"],
    )
    source = spark.createDataFrame(
        [(2, 99.0, "update"), (4, 40.0, "insert")], ["k", "v", "src"]
    )
    merged = merge_upsert(target, source, ["k"])
    rows = {r["k"]: (r["v"], r["src"]) for r in merged.collect()}
    assert rows == {
        1: (10.0, "target"),
        2: (99.0, "update"),
        3: (30.0, "target"),
        4: (40.0, "insert"),
    }
    # re-merging the same source is a no-op (idempotent replay)
    again = merge_upsert(merged, source, ["k"])
    assert {r["k"]: (r["v"], r["src"]) for r in again.collect()} == rows


def test_gopher_rules_flag_crafted_failures(spark, monkeypatch):
    from data_pipeline_001_spark.plans import queries_curation3 as c3

    short = "the a " + "scan " * 5          # 7 words -> fails f_words
    nostop = "scan batch merge window " * 10  # no stopwords -> fails f_stop
    good = ("the a scan batch merge window value table " * 5).strip()
    df = spark.createDataFrame(
        [(1, short), (2, nostop), (3, good)], ["doc_id", "text"]
    )
    monkeypatch.setattr(
        c3, "load_tables", lambda _s, _d: {"documents": df}
    )
    out = {r["doc_id"]: r for r in c3.gopher_rules_q(spark, SF).collect()}
    assert out[1]["f_words"] == 0
    assert out[2]["f_stop"] == 0 and out[2]["f_words"] == 1
    assert out[3]["passes"] == 1


def test_classifier_score_matches_hashlib(spark, monkeypatch):
    from data_pipeline_001_spark.plans import queries_curation3 as c3

    text = "the quick brown fox jumps"
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    monkeypatch.setattr(c3, "load_tables", lambda _s, _d: {"documents": df})
    row = c3.classifier_score_q(spark, SF).collect()[0]

    import math

    toks = text.split()
    wsum = sum(
        (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % c3._CLS_BUCKETS)
        * c3._CLS_MIX
        % c3._CLS_MOD
        for t in toks
    )
    margin = (wsum / c3._CLS_MOD / len(toks) - 0.5) * 4.0
    want = 1.0 / (1.0 + math.exp(-margin))
    assert abs(row["score"] - round(want, 6)) < 1e-9
    assert row["label"] == int(want >= 0.5)


def test_source_quota_caps_every_source(spark):
    from data_pipeline_001_spark.plans.queries_curation3 import (
        _QUOTA,
        source_quota_q,
    )

    out = source_quota_q(spark, SF)
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert per and all(r["n"] <= _QUOTA for r in per)
    assert out.where(F.col("rk") > _QUOTA).count() == 0


def test_split_leakage_detects_planted_copy(spark, monkeypatch):
    from data_pipeline_001_spark.plans import queries_curation3 as c3

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"filler{i} " + " ".join(f"w{i}_{j}" for j in range(12)))
            for i in range(1, 9)]          # train docs, unique grams
    rows.append((3 * c3._LEAK_MOD, base))  # holdout copy ...
    rows.append((9, base))                 # ... of a train doc
    rows.append((2 * c3._LEAK_MOD, "tiny doc below gram width"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(c3, "load_tables", lambda _s, _d: {"documents": df})
    out = {r["doc_id"]: r for r in c3.split_leakage_q(spark, SF).collect()}

    leaked = out[3 * c3._LEAK_MOD]
    assert leaked["leaked"] == 1 and leaked["containment"] == 1.0
    tiny = out[2 * c3._LEAK_MOD]
    assert tiny["n_grams"] == 0 and tiny["leaked"] == 0


def test_content_checksum_detects_mutation_and_ignores_order(spark):
    from data_pipeline_001_spark.operators.constraints import content_checksum

    rows = [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")]
    df = spark.createDataFrame(rows, ["k", "s", "t"])
    ck = lambda d: d.agg(  # noqa: E731
        content_checksum(["k", "s", "t"]).alias("c")
    ).collect()[0]["c"]

    base = ck(df)
    # row order / partitioning changes nothing
    assert ck(df.repartition(7).sortWithinPartitions("s")) == base
    # a single flipped cell changes the checksum (count stays equal)
    mutated = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "Z")], ["k", "s", "t"]
    )
    assert ck(mutated) != base
    # a moved row between groups is caught even at equal total counts
    g = (
        df.groupBy((df.k % 2).alias("g"))
        .agg(content_checksum(["k", "s", "t"]).alias("c"))
        .collect()
    )
    assert len({r["c"] for r in g}) == 2


def test_fuzzy_join_random_corpus_matches_bruteforce(spark):
    """Seeded random corpus over a 3-letter alphabet (dense distance-1
    neighborhoods, lengths 0-6 incl. duplicates) — the blocking must
    reproduce the brute-force pair set exactly."""
    import random

    from data_pipeline_001_spark.operators.fuzzy_join import editdist1_pairs

    rng = random.Random(1234)
    vals = [
        "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
        for _ in range(80)
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["name"])
    got = {
        (r["name_a"], r["name_b"])
        for r in editdist1_pairs(df, "name").collect()
    }
    uniq = sorted(set(vals))
    want = {
        (u, v)
        for i, u in enumerate(uniq)
        for v in uniq[i + 1 :]
        if _lev(u, v) == 1
    }
    assert got == want and len(want) > 20


def test_content_checksum_distinguishes_null_positions(spark):
    from data_pipeline_001_spark.operators.constraints import content_checksum

    a = spark.createDataFrame([("a", None, "x")], "c1 string, c2 string, c3 string")
    b = spark.createDataFrame([("a", "x", None)], "c1 string, c2 string, c3 string")
    ck = lambda d: d.agg(  # noqa: E731
        content_checksum(["c1", "c2", "c3"]).alias("c")
    ).collect()[0]["c"]
    assert ck(a) != ck(b)


def test_global_row_index_contiguous_and_parallel(spark):
    from data_pipeline_001_spark.operators.relational import global_row_index

    df = spark.createDataFrame(
        [(i * 3,) for i in range(0, 100)], ["k"]
    ).repartition(13)
    out = global_row_index(df, "k", bucket_width=25)
    rows = sorted((r["k"], r["row_idx"]) for r in out.collect())
    # contiguous 1..n following the key order
    assert [idx for _, idx in rows] == list(range(1, 101))
    # and no single-partition global sort in the plan
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange SinglePartition" not in plan


def test_parse_json_quarantine_routes_poison_records(spark):
    from data_pipeline_001_spark.functions.json_fns import (
        parse_json_quarantine,
    )

    df = spark.createDataFrame(
        [
            (1, '{"k": 5}'),
            (2, '{"k": not-json'),
            (3, '{"other": 1}'),   # missing field -> NULL, not quarantine
            (4, None),
        ],
        ["id", "payload"],
    )
    good, bad = parse_json_quarantine(df, "payload", "k INT")
    g = {r["id"]: r["k"] for r in good.collect()}
    assert g == {1: 5, 3: None, 4: None}
    b = bad.collect()
    assert [r["id"] for r in b] == [2]
    # the evidence survives verbatim
    assert b[0]["_corrupt_record"] == '{"k": not-json'
