"""Physical-plan regression tests: the optimizations we rely on at
scale must be visible in the plan, not assumed — predicate pushdown
to the parquet scan, column pruning, broadcast dimension joins,
map-side partial aggregation, TakeOrderedAndProject for top-k.
(SURVEY.md §4: 'built-in, free — but verify'.)"""

import re

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _exchange_args(plan: str) -> list[str]:
    """Arguments line of every shuffle Exchange detail block. In
    FORMATTED explain the node header '(12) Exchange' and its
    'Arguments: hashpartitioning(...)' live on separate lines, so a
    substring check for 'Exchange hashpartitioning' matches NOTHING —
    three bucketed-plan assertions were vacuous until round 10. This
    parser pins the real shape."""
    out = []
    for b in re.split(r"\n(?=\(\d+\) )", plan):
        head = b.splitlines()[0]
        if re.match(r"\(\d+\) Exchange\b", head):
            arg = next(
                (ln for ln in b.splitlines() if ln.startswith("Arguments:")),
                "",
            )
            out.append(arg)
    return out


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_filter_pushdown_reaches_scan(spark, registry):
    plan = _plan(registry["filter_predicate_stack"](spark, SF))
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "EqualTo(event_type,purchase)" in pushed
    assert "GreaterThan(value,50.0)" in pushed
    assert "IsNotNull(user_id)" in pushed


def test_column_pruning_in_read_schema(spark, registry):
    plan = _plan(registry["agg_distinct_days"](spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1) == "o_orderdate:timestamp"


def test_dimension_joins_are_broadcast(spark, registry):
    plan = _plan(registry["q05_nation_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_aggregation_has_partial_phase(spark, registry):
    # map-side combine: the pre-shuffle HashAggregate carries
    # partial_sum/partial_avg (node order in the tree is
    # HashAggregate(partial) → Exchange → HashAggregate(final))
    plan = _plan(registry["q01_pricing_summary"](spark, SF))
    assert "partial_sum" in plan and "partial_avg" in plan


def test_topk_uses_take_ordered(spark, registry):
    # ORDER BY + LIMIT must not materialize a global sort
    plan = _plan(registry["sort_topk_multikey"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_asof_join_plan_shapes(spark, registry):
    """The flagship as-of (tiny literal spine) must take the broadcast
    fast path: pure projection, ZERO Exchange. The general window path
    (forced via broadcast_threshold=None) must shuffle on the coarse
    time bucket — never collapse the raw data into one task; only the
    tiny per-bucket carry spine may use a single partition."""
    plan = _plan(registry["join_asof_events_spine"](spark, SF))
    assert "Exchange" not in plan
    assert "Window" not in plan

    from pyspark.sql import functions as F

    from data_pipeline_001_spark.functions.time_fns import window_spine
    from data_pipeline_001_spark.operators.relational import asof_join
    from data_pipeline_001_spark.session import load_tables

    t = load_tables(spark, SF)
    ticks = window_spine(
        spark, "2024-01-01 00:00:00", "2024-02-01 00:00:00", "7h"
    ).select(F.col("window_start").alias("tick"))
    slow = asof_join(
        t["events"].select("event_id", "ts"),
        ticks,
        left_time="ts",
        right_time="tick",
        broadcast_threshold=None,
    )
    plan = _plan(slow)
    assert "hashpartitioning(_bucket" in plan
    assert plan.count("SinglePartition") <= 1


def test_chunking_is_shuffle_free(spark, registry):
    """Document chunking is a pure per-row fan-out: its plan must show
    Generate (posexplode) and NO Exchange — at 100 TB a shuffle here
    would move the whole corpus for nothing."""
    plan = _plan(registry["text_chunk_documents"](spark, SF))
    assert "Generate" in plan
    assert "Exchange" not in plan


def test_embedding_near_dup_join_is_bucketed_not_cartesian(spark, registry):
    """The primary embedding near-dup must join candidates on the
    (table, bucket) hash keys — never a cartesian/nested-loop pairwise
    product (that is the exact twin's job at small sf only)."""
    plan = _plan(registry["dedup_embedding_lsh"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "tbl" in plan and "bucket" in plan


def test_bucketed_q03_single_irreducible_exchange(spark, registry):
    """The bucketed Q3 with EVERY broadcast disabled — the >ceiling
    regime at any scale: the fact-fact join and the per-order pre-agg
    run on the bucketed scans' own distribution, and the customer dim
    (c_custkey-bucketed since round 10) joins scan-local — exactly ONE
    exchange survives in the whole plan, the irreducible fact-side
    re-clustering onto o_custkey. (Round-10 note: the old assertion
    checked 'Exchange hashpartitioning' as a substring of FORMATTED
    explain output, where header and arguments are separate lines — it
    could never fail.)"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(registry["q03_shipping_priority_bucketed"](spark, SF))
        ex = _exchange_args(plan)
        assert len(ex) == 1, ex
        assert "o_custkey" in ex[0], ex
        assert "SortMergeJoin" in plan  # fact join co-located, not shuffled
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_q05_q10_bucket_keys_never_shuffle(spark, registry):
    """The bucketed twins under disabled broadcast: no exchange may
    carry either orderkey column (the fact layout's point) NOR
    c_custkey (the round-10 customer layout's point — the dimension
    side of every custkey join is scan-local; only the FACT side
    re-clusters). q05's surviving exchanges are o_custkey + the n_name rollup;
    q10's are the per-custkey re-aggregation + its bucket alignment."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for q in ("q05_nation_revenue_bucketed", "q10_returned_revenue_bucketed"):
            plan = _plan(registry[q](spark, SF))
            ex = _exchange_args(plan)
            assert ex, f"{q}: expected the irreducible custkey exchange"
            for arg in ex:
                assert "l_orderkey" not in arg, (q, arg)
                assert "o_orderkey" not in arg, (q, arg)
                assert "c_custkey" not in arg, (q, arg)
            assert "SortMergeJoin" in plan, q
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_no_row_python_udfs_anywhere(spark, registry):
    """Hot paths stay JVM-side; Python appears only via Arrow
    (mapInPandas → MapInPandas/ArrowEvalPython, never BatchEvalPython)."""
    for name in [
        "dedup_minhash_lsh",
        "dedup_simhash",
        "text_language_id",
        "similarity_bruteforce_topk",
        "multimodal_binary_features",
    ]:
        plan = _plan(registry[name](spark, SF))
        assert "BatchEvalPython" not in plan, name


def test_fuzzy_join_has_no_cross_product(spark, registry):
    """The deletion-neighborhood fuzzy join must stay an equi-join:
    a regression to BroadcastNestedLoop/CartesianProduct would make
    the levenshtein predicate an O(n^2) scan at scale."""
    plan = _plan(registry["join_fuzzy_editdist1"](spark, SF))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_shuffle_hash_hint_takes_effect(spark, registry):
    """The SHUFFLE_HASH hint must override the default sort-merge
    strategy — silent hint loss would waste two sorts at scale."""
    plan = _plan(registry["join_hint_shuffle_hash"](spark, SF))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan

GROWING_DIM_HINT = re.compile(
    r'F\.broadcast\(\s*t\["(?:customer|part|supplier|orders)"\]'
)


def test_no_broadcast_hints_on_growing_dimensions():
    """Scale guard: customer/part/supplier/orders grow linearly with
    scale factor — an explicit F.broadcast hint on any frame derived
    from them forces a multi-GB build at the 100 TB north star
    regardless of AQE. Hints are allowed only on bounded sides
    (nation/region <=25 rows, 1-row scalar aggregates). This test
    pins the round-5 de-hint: no source line may wrap a growing
    dimension table in F.broadcast(...)."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "data_pipeline_001_spark")
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        src = open(path).read()
        for m in GROWING_DIM_HINT.finditer(src):
            line = src[: m.start()].count("\n") + 1
            offenders.append(f"{os.path.relpath(path, root)}:{line}")
    assert not offenders, offenders


def test_dehinted_joins_still_broadcast_at_small_sf(spark, registry):
    """The de-hinted TPC-H plans must still get broadcast joins at
    bench scales from statistics + AQE (24 MB threshold) — removing
    the hint shifts the decision to the optimizer, it must not
    regress small-SF plans to shuffled joins. Executed-plan check:
    run each query under AQE and assert the final adaptive plan
    kept at least one BroadcastHashJoin and no cartesian product."""
    for name in (
        "q03_shipping_priority",
        "q10_returned_revenue",
        "part_type_revenue",
        "q14_promo_revenue",
        "q18_large_orders",
        "q07_volume_shipping",
        "q09_product_profit",
    ):
        df = registry[name](spark, SF)
        df.collect()  # drive AQE to the final physical plan
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_phash_near_dup_join_is_band_bucketed_not_cartesian(spark, registry):
    """Perceptual-hash near-dup candidates must come from the banded
    exact-match self-join (band/key equi-join) — never a cartesian /
    nested-loop pairwise product over the image corpus."""
    plan = _plan(registry["multimodal_phash_neardup"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "band" in plan and "key" in plan


def test_trigram_counts_are_arrow_packed_not_exploded(spark, registry):
    """Round-11 plan pin (supersedes the round-8 lower()-hoist pin,
    whose Generate node no longer exists): trigram counting must run
    through the packed Arrow map-side counter — no per-character
    Generate/explode, no Window in the gram build, and lower(text)
    still computed JVM-side in the projection feeding MapInArrow."""
    plan = _plan(registry["text_trigram_coverage"](spark, SF))
    assert "MapInArrow" in plan
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    gen = [
        b
        for b in blocks
        if b.startswith("(") and ") Generate" in b.splitlines()[0]
    ]
    assert not gen, "trigram build regressed to a per-char explode"
    assert "lower(" in plan  # normalization stays JVM-side


def test_embedding_cosine_is_single_arrow_task(spark, registry):
    """Round-11 plan pin (supersedes the round-8 norm-hoist pin, whose
    BroadcastNestedLoopJoin no longer exists): the exact pairwise
    cosine twin must be the one-task batched-NumPy form — a single
    MapInArrow over a Coalesce(1), no join of any kind in the plan
    (bit-identity with the old join+HOF arithmetic is pinned
    separately in test_llm_operators)."""
    plan = _plan(registry["dedup_embedding_cosine"](spark, SF))
    assert "MapInArrow" in plan and "Coalesce" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_sessionization_span_form_single_exchange(spark, registry):
    """Round-9 (verdict task 4): the round-8 span refactor
    (unit spans → interval merge → rollup, all partitioned by
    user_id) claims Catalyst reuses ONE user_id exchange — the same
    shuffle count as the old lag-flag form. That claim was asserted
    nowhere, and the refactor coincided with the only round-8 headline
    bench riser (+27%, inside VM spread). Pin it mechanically: the
    whole plan has exactly one shuffle Exchange (and no
    ReusedExchange — there should be nothing to re-shuffle)."""
    plan = _plan(registry["window_sessionization"](spark, SF))
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchange == 1, f"expected 1 shuffle Exchange, got {n_exchange}:\n{plan}"
    assert "ReusedExchange" not in plan
    # and that one exchange clusters on user_id — the reused ordering
    detail = re.search(r"\(\d+\) Exchange\n(?:Input.*\n)?Arguments: ([^\n]*)", plan)
    assert detail and "user_id" in detail.group(1), plan


def test_bucketed_reregistration_reuses_existing_files(spark, registry, tmp_path):
    """Round-9: a fresh session must NOT rewrite the bucketed tables
    when a complete prior layout exists on disk — ensure_bucketed
    re-registers it with bucketed-table DDL (the metastore-equivalent
    one-time registration; at sf100 the rewrite is ~17 GB and was the
    dominant cost of every fresh-session bucketed run). Simulated by
    stashing the files, dropping the managed table (metadata gone,
    files preserved), restoring the files, and calling ensure_bucketed
    again: the files must be byte-untouched, the row count identical,
    and the bucket metadata must still elide the fact-join shuffle."""
    import os
    import shutil

    from data_pipeline_001_spark.plans.queries_bucketed import (
        ensure_bucketed,
    )

    names = ensure_bucketed(spark, SF)
    n = names["orders"]
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, n)
    rows_before = spark.table(n).count()

    stash = str(tmp_path / "stash")
    shutil.move(loc, stash)
    spark.sql(f"DROP TABLE {n}")  # metadata only — files were moved out
    shutil.move(stash, loc)
    sig_before = {
        f: (os.path.getmtime(os.path.join(loc, f)), os.path.getsize(os.path.join(loc, f)))
        for f in os.listdir(loc)
    }

    names2 = ensure_bucketed(spark, SF)
    assert names2 == names
    sig_after = {
        f: (os.path.getmtime(os.path.join(loc, f)), os.path.getsize(os.path.join(loc, f)))
        for f in os.listdir(loc)
    }
    assert sig_after == sig_before, "re-registration rewrote the files"
    assert spark.table(n).count() == rows_before
    # the DDL-registered metadata must carry the bucket spec: no
    # exchange on any bucket key (fact orderkeys, dim custkey) —
    # under the default threshold the dim join broadcasts, so the
    # plan has NO shuffle exchange at all at this scale
    plan = _plan(registry["q03_shipping_priority_bucketed"](spark, SF))
    assert _exchange_args(plan) == []


def test_bucket_validation_rejects_multifile_and_restored_source(spark, tmp_path):
    """Round-10 (advice): two holes in the reuse validation, both now
    closed. (a) A multi-file-per-bucket layout (the pre-round-8 write
    pathology, or external perturbation with _SUCCESS intact) passed a
    DISTINCT-id count and would silently reinstate the 3-7x small-file
    scan penalty — validation now requires exactly one file per bucket
    id covering 0..n-1. (b) Freshness was mtime ORDERING only, so a
    source regenerated/restored with preserved timestamps (rsync -a,
    cp -p) passed and served stale rows — a source signature (sizes +
    mtimes + head/tail crc) recorded at materialization is now
    required to match exactly."""
    import json
    import os
    import shutil

    from data_pipeline_001_spark.plans.queries_bucketed import (
        _SIG_NAME,
        _auto_buckets,
        _bucket_files_complete,
        ensure_bucketed,
    )

    names = ensure_bucketed(spark, SF)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, names["orders"])
    src = os.path.join(SF, "orders.parquet")
    buckets = _auto_buckets(SF)
    assert _bucket_files_complete(loc, buckets, src) is True

    # (a) plant a duplicate part file for bucket 0: distinct ids still
    # cover the range, but the layout is no longer one-file-per-bucket
    part0 = next(
        f for f in sorted(os.listdir(loc)) if re.match(r"part-\d+-.*_00000", f)
    )
    dup = os.path.join(loc, "part-99999-deadbeef_00000.c000.snappy.parquet")
    shutil.copyfile(os.path.join(loc, part0), dup)
    try:
        assert _bucket_files_complete(loc, buckets, src) is False
    finally:
        os.remove(dup)
    assert _bucket_files_complete(loc, buckets, src) is True

    # (b) simulate a timestamp-preserving source restore: the recorded
    # signature (content crc) must catch what mtime ordering cannot.
    # Perturb the recorded signature rather than the read-only source.
    sig_path = os.path.join(loc, _SIG_NAME)
    with open(sig_path) as fh:
        sig = json.load(fh)
    assert sig, "materialization must record a non-empty source signature"
    sig[0][-1] ^= 1  # flip one crc bit: 'the source bytes changed'
    with open(sig_path, "w") as fh:
        json.dump(sig, fh)
    assert _bucket_files_complete(loc, buckets, src) is False
    # restore the true signature; the layout is reusable again
    sig[0][-1] ^= 1
    with open(sig_path, "w") as fh:
        json.dump(sig, fh)
    assert _bucket_files_complete(loc, buckets, src) is True

    # (c) round-11 advice closes: an ABSENT sidecar is rejected (the
    # old grandfather path could permanently legitimize a
    # timestamp-preserving restore), and a round-10 4-field sidecar
    # (with mtime_ns at index 2) still matches leniently — no
    # spurious multi-GB rebucket on the format upgrade.
    os.rename(sig_path, sig_path + ".bak")
    try:
        assert _bucket_files_complete(loc, buckets, src) is False
    finally:
        os.rename(sig_path + ".bak", sig_path)
    legacy = [[e[0], e[1], 0, e[-1]] for e in sig]  # old format, fake mtime
    with open(sig_path, "w") as fh:
        json.dump(legacy, fh)
    assert _bucket_files_complete(loc, buckets, src) is True
    with open(sig_path, "w") as fh:
        json.dump(sig, fh)


def test_bucketed_reregistration_rejects_stale_layout(spark, tmp_path):
    """The freshness half of re-registration: a bucketed layout OLDER
    than its source parquet (the driver regenerates testdata between
    rounds) must NOT be re-registered — serving stale rows would be a
    silent correctness hole. Simulated by aging the layout's _SUCCESS
    marker behind the source file's mtime."""
    import os

    from data_pipeline_001_spark.plans.queries_bucketed import (
        _bucket_files_complete,
        ensure_bucketed,
    )

    names = ensure_bucketed(spark, SF)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, names["orders"])
    src = os.path.join(SF, "orders.parquet")
    from data_pipeline_001_spark.plans.queries_bucketed import _auto_buckets

    buckets = _auto_buckets(SF)
    assert _bucket_files_complete(loc, buckets, src) is True
    # age the layout behind the source: stale => not reusable
    old = os.path.getmtime(src) - 10
    os.utime(os.path.join(loc, "_SUCCESS"), (old, old))
    assert _bucket_files_complete(loc, buckets, src) is False
    # restore freshness for the rest of the session's tests
    import time as _t

    now = _t.time()
    os.utime(os.path.join(loc, "_SUCCESS"), (now, now))
    assert _bucket_files_complete(loc, buckets, src) is True


def test_denorm_custkey_queries_no_fact_exchange(spark, registry):
    """Round-11 (verdict task 1): the denormalized custkey layout must
    remove the LAST structural exchange. With every broadcast disabled
    (the >ceiling regime at any scale): q03/q10 denorm plans contain
    ZERO shuffle Exchanges — per-customer(/order) rollup and customer
    join all run on the scans' own bucket distribution; q05 keeps
    exactly ONE, the 25-group n_name rollup of partial aggregates
    (bounded by nation count, never by data)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for q in ("q03_shipping_priority_denorm", "q10_returned_revenue_denorm"):
            plan = _plan(registry[q](spark, SF))
            assert _exchange_args(plan) == [], (q, _exchange_args(plan))
            assert "SortMergeJoin" in plan, q  # customer join co-located
        plan = _plan(registry["q05_nation_revenue_denorm"](spark, SF))
        ex = _exchange_args(plan)
        assert len(ex) == 1 and "n_name" in ex[0], ex
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_denorm_query_reads_denorm_layout(spark, registry):
    """Round-11 (verdict task 6): the dual orders layouts must not
    silently drift — q05/q03/q10 denorm plans must SCAN the
    custkey-clustered denormalized table (not fall back to the
    orderkey layout or the plain parquet)."""
    for q in (
        "q03_shipping_priority_denorm",
        "q05_nation_revenue_denorm",
        "q10_returned_revenue_denorm",
    ):
        plan = _plan(registry[q](spark, SF))
        assert "lineitem_denorm_cust_" in plan, q
        assert "customer_bkt_" in plan, q


def test_denorm_layout_staleness_validation(spark):
    """Round-11 (verdict task 6): the planted-perturbation contract
    extends to the second fact layout. A perturbed or absent
    signature sidecar (covering BOTH sources — lineitem and orders)
    must reject reuse; the restored sidecar must re-validate."""
    import json
    import os

    from data_pipeline_001_spark.plans.queries_bucketed import (
        _SIG_NAME,
        _auto_buckets,
        _bucket_files_complete,
        ensure_denorm_custkey,
    )

    name = ensure_denorm_custkey(spark, SF)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, name)
    srcs = [
        os.path.join(SF, "lineitem.parquet"),
        os.path.join(SF, "orders.parquet"),
    ]
    buckets = _auto_buckets(SF)
    assert _bucket_files_complete(loc, buckets, srcs) is True

    sig_path = os.path.join(loc, _SIG_NAME)
    with open(sig_path) as fh:
        sig = json.load(fh)
    # the signature must cover BOTH sources, basename-prefixed
    prefixes = {e[0].split("/", 1)[0] for e in sig}
    assert prefixes == {"lineitem.parquet", "orders.parquet"}, prefixes
    # perturb the ORDERS half: 'orders was restored with different bytes'
    bad = [list(e) for e in sig]
    idx = next(i for i, e in enumerate(bad) if e[0].startswith("orders"))
    bad[idx][-1] ^= 1
    with open(sig_path, "w") as fh:
        json.dump(bad, fh)
    assert _bucket_files_complete(loc, buckets, srcs) is False
    # absent sidecar: rejected outright (no grandfathering)
    os.remove(sig_path)
    assert _bucket_files_complete(loc, buckets, srcs) is False
    with open(sig_path, "w") as fh:
        json.dump(sig, fh)
    assert _bucket_files_complete(loc, buckets, srcs) is True


def test_layout_suffix_path_normalized():
    """Round-11: a relative sf_dir must resolve to the SAME layout
    name as its absolute form — the unnormalized suffix silently
    rebuilt ~17 GB of duplicate sf100 layouts under a second name."""
    import os

    from data_pipeline_001_spark.plans.queries_bucketed import _suffix

    rel = os.path.relpath(SF)
    assert _suffix(rel) == _suffix(SF)
    assert _suffix(SF + "/") == _suffix(SF)
