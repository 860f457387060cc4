"""Structured Streaming variant of the windowed pipeline (SURVEY.md
§2.10, §7 step 8).

The reference simulates streaming by hourly rescheduling + a manual
safe boundary; here the same semantics are native:

| reference concept            | streaming primitive                  |
|------------------------------|--------------------------------------|
| tumbling drive windows (F1)  | ``window(ts, granularity)``          |
| x_time_back safe boundary    | ``withWatermark(ts, x_time_back)``   |
| drive-table progress rows    | checkpoint + ``foreachBatch`` MERGE  |
| idempotent stage writes      | deterministic window-partition paths |
| session/sliding windows      | ``session_window`` / slide param     |

``foreachBatch`` writes each micro-batch's windows through the same
``Sink`` protocol and records per-window counts in the control table,
so the batch and streaming modes share connectors, audit logic, and
ops visibility. At scale the aggregation state lives in the state
store (RocksDB on executors), not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_001_spark.functions.time_fns import (
    parse_duration_seconds,
    parse_granularity_minutes,
)


def windowed_counts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    granularity: str = "1h",
    x_time_back: str = "1d",
    extra_aggs: dict | None = None,
) -> DataFrame:
    """Tumbling-window counts with late-data watermark.

    Returns a streaming DataFrame of
    (window_start, window_end, n_events[, extra aggs…]) that upgrades
    the reference's per-window ``source_count`` discovery (S1/A4) to
    incremental computation.
    """
    minutes = parse_granularity_minutes(granularity)
    watermark_s = parse_duration_seconds(x_time_back)
    aggs = [F.count("*").alias("n_events")]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return (
        events.withWatermark(ts_col, f"{watermark_s} seconds")
        .groupBy(F.window(F.col(ts_col), f"{minutes} minutes").alias("w"))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(name) for name in ["n_events", *list((extra_aggs or {}))]],
        )
    )


def sessionized_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30m",
) -> DataFrame:
    """Session windows per user — engine extension absent from the
    reference (SURVEY §2.10 'session/sliding windows: absent')."""
    gap_s = parse_duration_seconds(gap)
    return (
        events.withWatermark(ts_col, "1 hour")
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_s} seconds").alias("s"),
            F.col(user_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def sliding_window_stream(
    events: DataFrame,
    ts_col: str = "ts",
    length: str = "1h",
    slide: str = "15m",
) -> DataFrame:
    """Sliding-window counts (engine extension surface)."""
    length_m = parse_granularity_minutes(length)
    slide_m = parse_granularity_minutes(slide)
    return (
        events.withWatermark(ts_col, "1 hour")
        .groupBy(
            F.window(F.col(ts_col), f"{length_m} minutes", f"{slide_m} minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "1h",
    watermark: str = "1h",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on a key within a time interval:
    ``right.ts ∈ [left.ts, left.ts + max_delay]`` — e.g. purchases
    attributed to the click that preceded them within an hour.

    Both sides carry watermarks so the state store can evict rows
    once they can no longer match (without the interval bound, a
    stream-stream join would buffer both streams forever). State is
    partitioned by the join key across executors.

    ``how="leftOuter"`` emits unmatched left rows null-extended — but
    only once the watermark proves no match can still arrive, so outer
    results trail the inner ones by the watermark delay and rows
    younger than (max event time − watermark) at query end never emit
    their null form. That latency is the price of a correct outer
    result under late data, not an implementation artifact.
    """
    delay_s = parse_duration_seconds(max_delay)
    wm_s = parse_duration_seconds(watermark)
    lw = left.withWatermark(left_ts, f"{wm_s} seconds")
    rw = right.withWatermark(right_ts, f"{wm_s} seconds")
    joined = lw.join(
        rw,
        (lw[key_col] == rw[key_col])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {delay_s} SECONDS")),
        how,
    )
    return joined.drop(rw[key_col])


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream with a (small) dimension
    table. The static side is broadcast to every task per micro-batch
    — no state store involvement, the streaming analogue of the batch
    engine's broadcast dim joins."""
    return stream.join(F.broadcast(dim), on, how)


def deduplicated_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1h",
) -> DataFrame:
    """Streaming exactly-once dedup: drop key duplicates arriving
    within the watermark horizon (``dropDuplicatesWithinWatermark``) —
    the streaming form of the training-pipeline exact dedup, with
    state bounded by the watermark instead of growing forever.
    """
    from data_pipeline_001_spark.functions.time_fns import parse_duration_seconds

    wm = parse_duration_seconds(watermark)
    return events.withWatermark(ts_col, f"{wm} seconds").dropDuplicatesWithinWatermark(
        list(key_cols)
    )


class StreamingWindowPipeline:
    """readStream → window agg → foreachBatch into Sink + control table."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        source_schema,
        target_sink,
        control=None,
        ts_col: str = "ts",
        granularity: str = "1h",
        x_time_back: str = "1d",
        checkpoint_dir: str | None = None,
        fmt: str = "parquet",
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.source_schema = source_schema
        self.target_sink = target_sink
        self.control = control
        self.ts_col = ts_col
        self.granularity = granularity
        self.x_time_back = x_time_back
        self.checkpoint_dir = checkpoint_dir
        self.fmt = fmt

    def _read_stream(self) -> DataFrame:
        return (
            self.spark.readStream.schema(self.source_schema)
            .format(self.fmt)
            .load(self.source_dir)
        )

    def _sink_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch: write each window's rows through the Sink
        protocol (idempotent by deterministic window path) — exactly
        the reference's stage→target discipline, per micro-batch."""
        rows = batch_df.collect()  # window summaries only — bounded
        for r in rows:
            start, end = r["window_start"], r["window_end"]
            self.target_sink.load(
                self.spark.createDataFrame([r.asDict()], batch_df.schema), start, end
            )

    def start(self, output_mode: str = "append"):
        agg = windowed_counts_stream(
            self._read_stream(), self.ts_col, self.granularity, self.x_time_back
        )
        writer = agg.writeStream.outputMode(output_mode).foreachBatch(self._sink_batch)
        if self.checkpoint_dir:
            writer = writer.option("checkpointLocation", self.checkpoint_dir)
        return writer.start()


def rollup_maintaining_batch_handler(spark, rollup, bronze_path: str, ts_col: str = "ts"):
    """foreachBatch handler that keeps a ContinuousRollup current as a
    stream arrives — the streaming side of the hypertable continuous
    aggregate (operators/rollup.py).

    Medallion shape: each micro-batch appends raw rows to a bronze
    parquet table, then the rollup recomputes ONLY the day partitions
    the batch touched (refresh snaps to whole days) from bronze. Restart
    safety comes from the day-level recompute: re-appended rows after a
    replayed batch change bronze, and the next refresh of that day
    rebuilds the correct aggregate — the rollup never drifts.
    """
    from pyspark.sql import functions as F

    def handle(batch_df, batch_id: int) -> None:
        batch_df.persist()
        bounds = batch_df.agg(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).collect()[0]  # two scalars — bounded
        if bounds["lo"] is None:
            batch_df.unpersist()
            return
        batch_df.write.mode("append").parquet(bronze_path)
        batch_df.unpersist()
        from datetime import timedelta

        # [lo, hi] inclusive → half-open end just past hi (refresh
        # snaps both bounds outward to whole days anyway)
        rollup.refresh(
            spark.read.parquet(bronze_path),
            bounds["lo"],
            bounds["hi"] + timedelta(microseconds=1),
        )

    return handle


def constraint_gate_batch_handler(
    constraints,
    good_path: str,
    quarantine_path: str,
    report_path: str | None = None,
):
    """foreachBatch handler that applies the declarative quality gate
    (operators/constraints.check_constraints) to every micro-batch:
    a batch whose constraints ALL pass appends to ``good_path``; a
    failing batch is diverted whole to ``quarantine_path`` with its
    batch id, and the per-batch constraint report (one tiny row per
    constraint) optionally appends to ``report_path`` for ops.

    Batch-level (not row-level) diversion is deliberate: the
    constraints are aggregate properties (completeness rates, key
    uniqueness) that individual rows can't violate alone, and a
    restarted batch lands whole on the same side of the gate. The
    constraint evaluation is one aggregation over the (already
    materialized) micro-batch.

    Replay idempotence: foreachBatch is at-least-once (a crash between
    the write and the checkpoint commit replays the batch), so every
    output is keyed by batch id — data goes to a ``batch_id=<id>``
    subdirectory written with OVERWRITE, and the report likewise. A
    replayed batch rewrites its own directory instead of appending a
    duplicate; readers of the root see ``batch_id`` as a partition
    column for free.
    """
    import os

    from data_pipeline_001_spark.operators.constraints import check_constraints

    def handle(batch_df, batch_id: int) -> None:
        batch_df.persist()
        report = check_constraints(batch_df, constraints)
        rows = report.collect()  # one row per constraint — bounded
        ok = all(r["passed"] == 1 for r in rows)
        if report_path is not None:
            batch_df.sparkSession.createDataFrame(
                rows, report.schema
            ).write.mode("overwrite").parquet(
                os.path.join(report_path, f"batch_id={batch_id}")
            )
        dest = good_path if ok else quarantine_path
        batch_df.write.mode("overwrite").parquet(
            os.path.join(dest, f"batch_id={batch_id}")
        )
        batch_df.unpersist()

    return handle


def drift_gate_batch_handler(
    baseline_df,
    value_col: str,
    lo: float,
    hi: float,
    good_path: str,
    quarantine_path: str,
    psi_threshold: float = 0.2,
    n_bins: int = 10,
    report_path: str | None = None,
):
    """foreachBatch handler that gates every micro-batch on
    distribution drift: the batch's ``value_col`` histogram is
    compared to a STATIC baseline snapshot via PSI
    (operators/constraints.drift_psi); a batch whose total PSI stays
    under ``psi_threshold`` appends to ``good_path``, a drifted batch
    is quarantined whole. The per-batch, per-bin PSI report
    (n_bins tiny rows) optionally lands under ``report_path``.

    The baseline side of the PSI plan is re-evaluated per batch;
    callers should pass an already-persisted (or parquet-backed)
    baseline so each micro-batch pays one small aggregation, not a
    baseline recompute. Same replay-idempotence contract as
    constraint_gate_batch_handler: every output keyed by batch id,
    written with OVERWRITE.
    """
    import os

    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.constraints import drift_psi

    def handle(batch_df, batch_id: int) -> None:
        batch_df.persist()
        report = drift_psi(
            baseline_df, batch_df, value_col, lo=lo, hi=hi, n_bins=n_bins
        )
        rows = report.collect()  # n_bins rows — bounded
        psi = sum(r["psi_term"] for r in rows)
        ok = psi < psi_threshold
        if report_path is not None:
            batch_df.sparkSession.createDataFrame(rows, report.schema).withColumn(
                "total_psi", F.lit(psi)
            ).write.mode("overwrite").parquet(
                os.path.join(report_path, f"batch_id={batch_id}")
            )
        dest = good_path if ok else quarantine_path
        batch_df.write.mode("overwrite").parquet(
            os.path.join(dest, f"batch_id={batch_id}")
        )
        batch_df.unpersist()

    return handle


# ---------------------------------------------------------------------
# Streaming engagement (DAU/WAU/MAU) — round-6 analytic tied back to
# the §2.10 streaming contract (reference semantics: the watermark
# analogue of state_manager.py:333-363)
# ---------------------------------------------------------------------


def engagement_pairs_stream(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "1 day"
) -> DataFrame:
    """Distinct-activity candidate stream for the engagement rollup:
    (user_id, day) pairs from the raw event stream, watermarked so the
    late-data bound is explicit. Deduplication happens downstream at
    the sink (per-batch ``dropDuplicates`` + keyed merge), so this
    projection carries no stream state at all — the maintained
    VersionedTable IS the state, which is what lets the rollup share
    code verbatim with the batch query."""
    return (
        stream.withWatermark(ts_col, watermark)
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.col(ts_col).cast("date").alias("day"))
    )


def engagement_stream_sink(table):
    """foreachBatch handler maintaining the distinct (user_id, day)
    activity table: dedupe the micro-batch, then upsert by key through
    ``versioned_stream_merge_sink`` — which skips replayed batch_ids on
    the manifest, so the activity table is EXACTLY-ONCE even under
    foreachBatch's at-least-once delivery. The engagement rollup
    (``plans.queries_spc.engagement_rollup``) over ``table.read()``
    then equals the batch query on the same events — asserted by the
    stream/batch parity test."""
    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_merge_sink,
    )

    merge = versioned_stream_merge_sink(table, ["user_id", "day"])

    def handle(batch_df, batch_id: int) -> None:
        merge(batch_df.dropDuplicates(["user_id", "day"]), batch_id)

    return handle


# ---------------------------------------------------------------------
# Streaming sessionization (round-8) — the second stream/batch parity
# analytic after round-7's engagement rollup. Unlike session_window
# (which finalizes sessions at the watermark and drops trailing ones
# at end-of-stream), this sink maintains the SESSION-SPAN table itself
# as the state: interval-merging is associative (operators/windows.
# coalesce_session_spans), so merging each micro-batch's unit spans
# into the maintained spans yields exactly the batch sessionization of
# all events seen so far — late and out-of-order events included, no
# watermark loss, state bounded by sessions rather than events.
# ---------------------------------------------------------------------


def session_events_stream(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "1 day"
) -> DataFrame:
    """Projection feeding the session sink: watermarked raw
    (user_id, ts) events. No stream state — the maintained
    VersionedTable IS the state (same design as the engagement
    rollup's pairs stream). Precondition: the source delivers each
    event at most once across micro-batches (compose with
    ``deduplicated_stream`` for at-least-once sources); replayed whole
    BATCHES are handled exactly-once by the sink's manifest check."""
    return (
        stream.withWatermark(ts_col, watermark)
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.col(ts_col).alias("ts"))
    )


def session_stream_sink(table, gap_minutes: int = 30):
    """foreachBatch handler maintaining the per-user session-span
    table in a VersionedTable: per batch, rewrite ONLY the touched
    users' spans — existing spans of users present in the batch are
    re-coalesced together with the batch's unit spans (associativity
    makes that equal to sessionizing all raw events at once), while
    untouched users' rows carry over. Exactly-once under foreachBatch
    replays via the batch_id-on-the-manifest check, same as
    ``versioned_stream_merge_sink``.

    Scale: the rewrite is proportional to the CURRENT table size per
    batch (one version per batch). A 100 TB deployment bounds that by
    partitioning the span table on a user-hash bucket and rewriting
    only buckets containing touched users — the merge math is
    unchanged; this single-file variant keeps the test surface
    small."""
    from data_pipeline_001_spark.operators.windows import (
        coalesce_session_spans,
        unit_session_spans,
    )
    from data_pipeline_001_spark.sources.versioned_table import (
        batch_already_committed,
    )

    def handle(batch_df, batch_id: int) -> None:
        if batch_already_committed(table, batch_id):
            return
        unit = unit_session_spans(batch_df)
        if table.current_version() == 0:
            spans = coalesce_session_spans(unit, gap_minutes)
        else:
            cur = table.read()
            touched = cur.join(
                unit.select("user_id").distinct(), "user_id", "left_semi"
            ).unionByName(unit)
            kept = cur.join(
                unit.select("user_id").distinct(), "user_id", "left_anti"
            )
            spans = coalesce_session_spans(touched, gap_minutes).unionByName(
                kept
            )
        rel = table._write_data(spans)
        table._commit([rel], "stream-sessionize", extra={"batch_id": batch_id})

    return handle


# ---------------------------------------------------------------------
# Streaming SPC (round-8) — the third stream/batch parity analytic.
# The XmR chart's input is a daily integer-cents revenue series;
# integer addition is associative and commutative, so maintaining the
# series incrementally (per-batch partial sums folded into a
# VersionedTable by the additive sink) reproduces the batch daily
# table EXACTLY under any micro-batch split — and the chart itself
# (plans.queries_spc.xmr_daily_rollup) is shared verbatim.
# ---------------------------------------------------------------------


def daily_revenue_stream(
    stream,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
):
    """Projection feeding the SPC sink: (day, rev_c BIGINT cents) from
    a raw orders stream — the same integer-cents quantization as the
    batch query, applied BEFORE any summation so partial sums stay
    exact. No stream state; the maintained VersionedTable is the
    state (the engagement/sessionization design)."""
    return stream.select(
        F.col(date_col).cast("date").alias("day"),
        F.round(F.col(amount_col) * 100).cast("long").alias("rev_c"),
    )


def spc_daily_stream_sink(table):
    """foreachBatch handler maintaining the daily revenue series for
    the streaming control chart: per-batch partial sums fold into the
    keyed table exactly once (batch_id on the manifest). The XmR
    rollup over ``table.read()`` then equals the batch
    ``quality_spc_xmr`` registry query on the same orders — asserted
    by the stream/batch parity test."""
    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_additive_sink,
    )

    return versioned_stream_additive_sink(table, ["day"], ["rev_c"])


# ---------------------------------------------------------------------
# Streaming exact-dedup fingerprint maintenance (round-9) — the FOURTH
# stream/batch parity analytic (engagement, sessionization, SPC, now
# dedup). The fingerprint rollup (fp → n_copies, min-id survivor) is a
# fold of associative/commutative aggregates, so maintaining it per
# micro-batch reproduces the batch `exact_duplicates` of all documents
# seen so far — the streaming half of a production ingest whose batch
# half is `dedup_incremental` (new docs anti-join this very table).
# ---------------------------------------------------------------------


def dedup_documents_stream(stream, text_col: str = "text",
                           id_col: str = "doc_id"):
    """Projection feeding the dedup sink: (doc_id, text) from a raw
    document stream. No stream state — the maintained fingerprint
    VersionedTable IS the state (the engagement/sessionization/SPC
    design). Precondition: each document arrives at most once across
    micro-batches (compose with ``deduplicated_stream`` for
    at-least-once sources); replayed whole BATCHES are exactly-once
    via the sink's manifest check."""
    return stream.where(F.col(id_col).isNotNull()).select(id_col, text_col)


def dedup_fingerprint_stream_sink(table, text_col: str = "text",
                                  id_col: str = "doc_id"):
    """foreachBatch handler maintaining the exact-dedup fingerprint
    table: the BATCH operator ``operators.dedup.exact_duplicates``
    (shared verbatim — same normalization, same md5, same min-id
    survivor rule) computes the micro-batch's partial rollup, and the
    fold sink merges it by fp (n_copies: sum, keep_id: min — both
    associative and commutative, so any micro-batch split of the
    corpus yields the identical table). ``table.read()`` then equals
    the batch ``dedup_exact_fingerprint`` registry query over the same
    documents, row for row — asserted by the parity test. The
    fingerprint table is distinct-text-sized; at 100 TB it is the
    accumulated corpus side ``dedup_incremental`` anti-joins against,
    kept current by this sink instead of recomputed per ingest."""
    from data_pipeline_001_spark.operators.dedup import exact_duplicates
    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_fold_sink,
    )

    fold = versioned_stream_fold_sink(
        table, ["fp"], {"n_copies": "sum", "keep_id": "min"}
    )

    def handle(batch_df, batch_id: int) -> None:
        fold(exact_duplicates(batch_df, text_col, id_col), batch_id)

    return handle


# ---------------------------------------------------------------------
# stream/batch parity analytic #5: peak concurrency (round-10)
# ---------------------------------------------------------------------


def activity_events_stream(stream, ts_col: str = "ts"):
    """Projection feeding the peak-concurrency sink: event timestamps
    from a raw event stream. No stream state — the maintained
    boundary-point VersionedTable IS the state (the engagement /
    sessionization / SPC / dedup design)."""
    return stream.where(F.col(ts_col).isNotNull()).select(ts_col)


def peak_concurrency_stream_sink(table, ts_col: str = "ts",
                                 span_minutes: int = 5):
    """foreachBatch handler maintaining the boundary-point delta table
    behind ``window_peak_concurrency``: the batch operator
    ``operators.windows.activity_points`` (shared verbatim — same span
    clip, same half-open deltas) turns each micro-batch into (+1/-1)
    points, and the fold sink merges them per (day, t) with a SUM —
    associative and commutative, so ANY micro-batch split of the
    events folds to the identical table. The downstream
    ``operators.windows.peak_sweep`` over ``table.read()`` then equals
    the batch registry query row for row (the net-delta form skips
    only intra-instant prefixes that can never be the max — proof in
    peak_sweep's docstring; asserted by the parity test).

    State size: one row per distinct span boundary instant per day —
    at most 2x events, in practice collapsed by the fold; a 100 TB
    deployment quantizes ``t`` to a fixed tick (e.g. 1 s), making the
    table calendar-bounded (86 400 x days keys) with identical sweep
    semantics at tick resolution. The fold sink's ``max_rows`` guard
    fails loudly if the key set outgrows the key-sized-table bound
    instead of silently degrading every micro-batch."""
    from data_pipeline_001_spark.operators.windows import activity_points
    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_fold_sink,
    )

    fold = versioned_stream_fold_sink(table, ["day", "t"], {"delta": "sum"})

    def handle(batch_df, batch_id: int) -> None:
        fold(
            activity_points(batch_df, ts_col=ts_col,
                            span_minutes=span_minutes),
            batch_id,
        )

    return handle


# ---------------------------------------------------------------------
# stream/batch parity analytic #6: MinHash near-dup (round-11)
# ---------------------------------------------------------------------


def minhash_signature_stream_sink(table, text_col: str = "text",
                                  id_col: str = "doc_id",
                                  num_hashes: int = 32,
                                  shingle_words: int = 3,
                                  seed: int = 42):
    """foreachBatch handler maintaining the per-doc MinHash table
    behind ``dedup_minhash_lsh``: the batch helper
    ``operators.dedup._minhash_per_doc`` (shared verbatim — same
    shingling, same murmur3 base hash, same (a·h+b) mod p signature
    rows, same hashed-shingle verify sets) turns each micro-batch into
    (id, sig, sh_set) rows, and the fold sink merges them by id. The
    per-doc row is a PURE per-document function — each document
    contributes exactly one row regardless of the micro-batch split —
    so the min-fold is the identity on first delivery and makes a
    replayed document deterministic (same text ⇒ same sig; sh_set
    arrays may differ only in collect_set order, which the
    order-insensitive downstream set ops ignore).

    Downstream, ``operators.dedup.minhash_pairs_from_per_doc`` over
    ``table.read()`` — the SAME extraction code the batch operator
    runs on its persisted per-doc table — yields the identical
    verified pair set, row for row (asserted by the parity test).
    Scale shape: the O(corpus) text processing (shingle explode +
    signature groupBy) streams once per document; the maintained
    table is one row per document (32 longs + the hashed shingle
    set), the same artifact ``minhash_incremental`` treats as the
    precomputed corpus side of its ingest gate — this sink is what
    keeps that corpus side current between ingests."""
    from data_pipeline_001_spark.operators.dedup import _minhash_per_doc
    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_fold_sink,
    )

    fold = versioned_stream_fold_sink(
        table, ["id"], {"sig": "min", "sh_set": "min"}
    )

    def handle(batch_df, batch_id: int) -> None:
        fold(
            _minhash_per_doc(
                batch_df, text_col, id_col, num_hashes, shingle_words, seed
            ),
            batch_id,
        )

    return handle
