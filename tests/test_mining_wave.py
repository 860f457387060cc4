"""Round-6 wave 5: association rules, Fellegi-Sunter weights, RAKE
keywords, video frame sampling. Cross-engine parity lives in the
oracle gate; these pin the algorithmic invariants."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.multimodal import (
    make_mbmp,
    mbmp_frame_features,
)

SF = "/root/testdata/sf0.001"


def test_association_rules_identities(spark):
    from data_pipeline_001_spark.plans.queries_mining import (
        itemset_association_rules,
    )

    rows = itemset_association_rules(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.support_cnt >= 2
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
        assert r.antecedent != r.consequent
    # both directions of a pair share the same lift (symmetric)
    by_pair = {}
    for r in rows:
        key = tuple(sorted((r.antecedent, r.consequent)))
        by_pair.setdefault(key, []).append(r.lift)
    for lifts in by_pair.values():
        if len(lifts) == 2:
            assert lifts[0] == pytest.approx(lifts[1], abs=1e-6)
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_fellegi_sunter_weights(spark):
    from data_pipeline_001_spark.plans.queries_mining import (
        er_fellegi_sunter,
    )

    rows = {r.field: r for r in er_fellegi_sunter(spark, SF).collect()}
    assert set(rows) == {"acctbal_bucket", "mktsegment", "name", "nationkey"}
    for r in rows.values():
        assert 0.0 <= r.u_prob <= 1.0 and 0.0 <= r.m_prob <= 1.0
        # a discriminating field agrees more among matches
        assert r.m_prob >= r.u_prob
        assert r.w_agree > 0.0       # agreement is evidence FOR a match
        assert r.w_disagree < 0.0    # disagreement is evidence AGAINST
    # nationkey never corrupted in duplicates -> m = 1 exactly,
    # and the continuity clamp still yields a finite weight
    assert rows["nationkey"].m_prob == 1.0
    # planted corruption schedule: every 2nd dup changes the name
    assert 0.3 < rows["name"].m_prob < 0.7
    # u is low for name (TPC-H names are unique), high-ish for segment
    assert rows["name"].u_prob < 0.01
    assert rows["mktsegment"].u_prob > 0.1


def test_rake_planted_phrase_scores(spark):
    """'machine learning pipeline' (3 unscored-unique words) must
    outscore the single word 'data' appearing alone: RAKE favors
    longer phrases of co-occurring words."""
    from data_pipeline_001_spark.plans import queries_mining as M
    import data_pipeline_001_spark.session as sess

    docs = spark.createDataFrame(
        [
            (1, "machine learning pipeline from the machine learning"),
            (2, "data and data and data"),
        ],
        "doc_id long, text string",
    )
    orig = sess.load_tables
    try:
        M.load_tables = lambda s, d: {"documents": docs}
        rows = {r.phrase: r for r in M.text_keyword_rake(spark, "x").collect()}
    finally:
        M.load_tables = orig
    # doc 1 phrases: "machine learning pipeline", "machine learning"
    # word scores: machine deg=(3+2)=5 freq=2 -> 2.5; learning 2.5;
    # pipeline 3/1 = 3.0
    assert rows["machine learning pipeline"].score == pytest.approx(8.0)
    assert rows["machine learning"].score == pytest.approx(5.0)
    # doc 2: three "data" phrases of length 1 -> score 1.0, 3 occurrences
    assert rows["data"].score == pytest.approx(1.0)
    assert rows["data"].n_occurrences == 3
    # stopwords never appear inside phrases
    for p in rows:
        assert not ({"from", "the", "and"} & set(p.split()))


def test_mbmp_container_roundtrip():
    feats = mbmp_frame_features(make_mbmp(42), stride=3)
    assert [f["frame_idx"] for f in feats] == [0, 3, 6]
    assert all(f["n_frames"] == 8 for f in feats)
    # closed form: doc 42 -> w=6, h=3; mean_r = 42 + (f*11)%50 + 2.5 + 1
    for f in feats:
        assert f["mean_r"] == pytest.approx(
            42 + (f["frame_idx"] * 11) % 50 + 3.5
        )


def test_mbmp_rejects_garbage():
    with pytest.raises(ValueError):
        mbmp_frame_features(b"nope" + b"\x00" * 16)


def test_video_framesample_distributed(spark):
    from data_pipeline_001_spark.plans.queries_mining import (
        multimodal_video_framesample,
    )

    rows = multimodal_video_framesample(spark, SF).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    for did, frames in by_doc.items():
        assert [f.frame_idx for f in sorted(frames, key=lambda x: x.frame_idx)] == list(
            range(0, 6 + did % 5, 3)
        )
