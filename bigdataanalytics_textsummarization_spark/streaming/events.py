"""Structured Streaming over the events table + batch analogs.

The reference has no streaming at all (SURVEY.md §2.9) — this module is the
engine's forward-looking stream surface, built the idiomatic Spark way:

- ``read_events_stream``: file-source ``readStream`` with an explicit schema
  (streaming sources cannot infer), so the same parquet directory drives both
  batch and stream paths;
- watermarked tumbling/session-window aggregations that run identically in
  batch (``queries()`` entries below, DuckDB-checkable) and streaming;
- a custom stateful operator (running per-user totals) via
  ``applyInPandasWithState`` — the Spark-native replacement for hand-rolled
  per-key state loops.

Scale notes: windowed aggs shuffle once on (key, window) with map-side
partial aggregation; the watermark bounds state size, which is what makes
the operator viable on an unbounded 100 TB/day stream.  Session windows
merge in the state store; gap-bounded sessions keep per-key state O(open
sessions), not O(events).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

from ..functions import r6, sum2dp
from ..io import load_table

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_GAP = "30 minutes"


# ---------------------------------------------------------------------------
# streaming surface
# ---------------------------------------------------------------------------


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema fixed up front).

    In production this is the same call pointed at a landing directory (or
    swapped for a Kafka source); every transformation below is source-
    agnostic.  Streams can't infer schemas, so the file schema is sniffed
    with one batch footer read; the legacy nanos-as-long layout is handled
    like the batch reader, newer TIMESTAMP(MICROS) files pass through.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    file_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    nanos = isinstance(file_schema["ts"].dataType, T.LongType)
    # the file source requires a directory: scan sf_dir, glob to the table
    sdf = (
        spark.readStream.schema(file_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if nanos:
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # watermarks demand TIMESTAMP (ltz); the parquet column is NTZ.
        # Under the session's UTC timezone the cast is value-identity.
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return sdf


def hourly_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling 1-hour window x event_type aggregation.

    Late rows beyond the watermark are dropped and their window state
    evicted — bounded state on an unbounded stream.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            r6(sum2dp(F.col("value"))).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessions_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gap-based session windows per user (native session_window merge)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            r6(sum2dp(F.col("value"))).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


_RUNNING_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)
_RUNNING_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful update: accumulate per-user (count, sum) across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [(round(total, 6) + 0.0)]}
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user totals, emitted per batch.

    ``applyInPandasWithState`` = Arrow-batched Python state machine; the
    state store shuffles once on user_id and persists between micro-batches.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=_RUNNING_OUT,
        stateStructType=_RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enriched_segment_stream(
    events: DataFrame, customers: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-static enrichment join + windowed aggregation.

    The standard streaming-ETL shape: an unbounded event stream joins a
    bounded dimension (broadcast — re-read per micro-batch, so dimension
    updates are picked up), then aggregates per (window, segment).  No
    state is kept for the join side; only the windowed aggregate holds
    watermark-bounded state.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            r6(sum2dp(F.col("value"))).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming deduplication — the front gate of a training-data ingest.

    One event per (user_id, event_type, hour): ``dropDuplicatesWithinWatermark``
    keeps per-key state only until the watermark passes the key's window, so
    state stays bounded on an unbounded stream (plain ``dropDuplicates``
    would grow state forever).  The batch twin is ``events_dedup`` below —
    the streaming operator keeps the first *arrival*, the batch query the
    first *event time*; they agree whenever the stream is time-ordered
    (asserted on the sorted fixture in tests/test_streaming.py).
    """
    keyed = events.withColumn("ts_hour", F.date_trunc("hour", F.col("ts")))
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "ts_hour"]
    )


ATTRIBUTION_WINDOW_S = 30 * 60


def view_click_stream_join(
    views: DataFrame, clicks: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: click ↔ same-user views ≤ 30 min before.

    The canonical two-stream correlation (impression→conversion).  Both
    sides carry a watermark AND the join predicate bounds event time on
    both sides — together they let Spark evict buffered rows once the
    watermark passes ``click_ts - 30 min``, so join state stays bounded on
    unbounded streams.  An unconstrained stream-stream join would buffer
    both streams forever.  Batch twin: ``view_click_pairs`` (oracle-gated);
    stream==batch asserted in tests/test_streaming.py.
    """
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return (
        c.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("click_ts"))
            & (
                F.col("view_ts")
                >= F.col("click_ts") - F.expr(f"interval {ATTRIBUTION_WINDOW_S} seconds")
            ),
        )
        .select(
            "user_id",
            "click_id",
            "click_ts",
            "view_id",
            "view_ts",
            # unix_micros needs TIMESTAMP; source columns are TIMESTAMP_NTZ,
            # so hop through LTZ (identity under the session's UTC timezone)
            F.expr(
                "(unix_micros(cast(click_ts as timestamp_ltz))"
                " - unix_micros(cast(view_ts as timestamp_ltz))) div 1000000"
            ).alias("lag_seconds"),
        )
    )


def stream_parquet_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    sink_dir: str,
    checkpoint_dir: str,
) -> None:
    """Incremental exactly-once ingest: file-source stream → parquet sink.

    The checkpoint records which source files each micro-batch consumed and
    the sink commits files transactionally per batch, so the pipeline can
    be killed and re-launched at any point: already-processed files are
    never re-read, half-written batches are never exposed.  With
    ``availableNow`` this doubles as the idempotent catch-up runner — the
    scheduled-batch shape of a training-data landing zone (run hourly,
    process only the files that arrived since the last run).  Restart
    delta-processing and no-duplicates are asserted in
    tests/test_streaming.py.
    """
    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_materialize(
    spark: SparkSession,
    agg_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    *partition_cols: str,
) -> None:
    """Stream-driven materialized view: complete-mode aggregate →
    ``foreachBatch`` → atomic parquet overwrite.

    Each trigger hands ``foreachBatch`` the FULL current aggregate, which
    replaces the sink in one batch-scoped overwrite — the table stays
    queryable by any engine between refreshes, retries are idempotent
    (same batch → same overwrite), and the checkpoint guarantees a killed
    refresh resumes instead of double-applying.  This is the Delta-free
    pattern for keeping a serving table in sync with a stream; with
    ``availableNow`` it is the scheduled catch-up refresh job.
    """

    def overwrite(batch_df: DataFrame, _batch_id: int) -> None:
        w = batch_df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(sink_dir)

    q = (
        agg_stream.writeStream.foreachBatch(overwrite)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_TRANS_STATE = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)
_TRANS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
    ]
)


def _emit_transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful consecutive-pair emitter: state = the user's last event,
    so pairs bridge micro-batch boundaries."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        return
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    types = list(batch["event_type"])
    prev_type = state.get[2] if state.exists else None
    froms, tos = [], []
    for t in types:
        if prev_type is not None:
            froms.append(prev_type)
            tos.append(t)
        prev_type = t
    last = batch.iloc[-1]
    state.update(
        (int(last["ts"].value // 1000), int(last["event_id"]), str(last["event_type"]))
    )
    if froms:
        yield pd.DataFrame(
            {"user_id": key[0], "from_type": froms, "to_type": tos}
        )


def transitions_pairs_stream(events: DataFrame) -> DataFrame:
    """Stream-legal twin of the pair step inside ``event_transitions``:
    per-user consecutive (from_type, to_type) pairs via
    ``applyInPandasWithState`` (append mode — raw pairs, not aggregates,
    so the sink sees each transition exactly once).  The state store keeps
    only the user's LAST event; the pair emitted at a micro-batch boundary
    bridges through it.  Counting the pairs reproduces the batch
    transition counts exactly (proof: test_streaming.py).  Per-user order
    within a micro-batch is established by an explicit (ts, event_id)
    sort; as with the sibling stateful ops, cross-batch order relies on
    the source delivering in-order per key (true for availableNow file
    replay; a production deploy adds a watermark-bounded reorder buffer).
    """
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _emit_transitions,
            outputStructType=_TRANS_OUT,
            stateStructType=_TRANS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_FUNNEL_STATE = T.StructType(
    [
        T.StructField("view_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
    ]
)
_FUNNEL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("view_ts", T.TimestampType()),
        T.StructField("click_ts", T.TimestampType()),
        T.StructField("purchase_ts", T.TimestampType()),
        T.StructField("steps", T.LongType()),
        T.StructField("converted", T.BooleanType()),
    ]
)


def _advance_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """First-touch funnel state machine: scanning in-order, the first
    view is THE earliest view, the first later click is the earliest
    click after it, likewise the purchase — so the streaming fixpoint
    equals the batch three-stage min-aggregation chain."""
    # deferred: relational_ext imports this module (cycle at import time)
    from ..relational_ext import FUNNEL_WINDOW_MIN

    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        return
    view_us, click_us, purchase_us = (
        state.get if state.exists else (None, None, None)
    )
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    for r in batch.itertuples():
        ts_us = int(r.ts.value // 1000)
        if r.event_type == "view" and view_us is None:
            view_us = ts_us
        elif (
            r.event_type == "click"
            and view_us is not None
            and click_us is None
            and ts_us > view_us
        ):
            click_us = ts_us
        elif (
            r.event_type == "purchase"
            and click_us is not None
            and purchase_us is None
            and ts_us > click_us
        ):
            purchase_us = ts_us
    state.update((view_us, click_us, purchase_us))
    if view_us is None:
        return  # batch semantics: only users with >= 1 view appear
    steps = 1 + (click_us is not None) + (purchase_us is not None)
    converted = purchase_us is not None and (
        purchase_us <= view_us + FUNNEL_WINDOW_MIN * 60 * 1_000_000
    )
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "view_ts": [pd.Timestamp(view_us * 1000)],
            "click_ts": [
                pd.Timestamp(click_us * 1000) if click_us is not None else None
            ],
            "purchase_ts": [
                pd.Timestamp(purchase_us * 1000)
                if purchase_us is not None
                else None
            ],
            "steps": [steps],
            "converted": [converted],
        }
    )


def funnel_stream(events: DataFrame) -> DataFrame:
    """Stream-legal twin of ``relational_ext.event_funnel``: per-user
    first-touch funnel state advanced by ``applyInPandasWithState``
    (update mode — each micro-batch re-emits a touched user's current
    funnel row; the LAST row per user is the fixpoint and equals the
    batch query's row, proof in test_streaming.py).  State is three
    timestamps per user — O(active users), independent of history; the
    one shuffle is on user_id, the same key the batch chain reuses across
    its three stages."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _advance_funnel,
            outputStructType=_FUNNEL_OUT,
            stateStructType=_FUNNEL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_to_memory(
    spark: SparkSession, sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DF to completion (availableNow) into a memory sink
    and return the materialized result as a batch DataFrame."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# batch analogs (driver-gated: oracle parity below)
# ---------------------------------------------------------------------------


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute slide, per event_type.

    Each event lands in exactly length/slide = 2 windows; Spark's window()
    enumerates them JVM-side, the oracle unrolls k in {0,1}.
    """
    ev = load_table(spark, sf_dir, "events")
    # avg rounded to 6dp in EXACT integer arithmetic: cents sums are exact
    # bigints, and half-up rounding of sum/(100 n) to micros is
    # (2*sc*10000 + n) div (2n) — double round() ties (e.g. avg =
    # 65.3103125) are resolved differently by different engines, observed
    # as a 1-row mismatch at sf0.1.
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sc"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            (
                F.expr("(2 * sc * 10000 + n_events) div (2 * n_events)")
                / F.lit(1000000.0)
            ).alias("avg_value"),
        )
    )


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) as a batch query.

    lag() + cumulative-sum-of-breaks is the classic SQL encoding; the
    streaming twin is ``sessions_stream`` (native session_window) and the
    two agree on closed sessions — asserted in tests/test_streaming.py.
    """
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = 30 * 60
    # ts arrives as TIMESTAMP_NTZ from parquet; NTZ has no direct numeric
    # cast, so hop through LTZ (identity under the session's UTC timezone)
    # to get epoch seconds for the gap comparison.
    ts_s = F.col("ts").cast("timestamp_ltz").cast("double")
    with_break = ev.withColumn(
        "new_session",
        F.when(
            ts_s - F.lag(ts_s).over(order) > gap_s,
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    numbered = with_break.withColumn(
        "session_no",
        F.sum("new_session")
        .over(order.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        r6(sum2dp(F.col("value"))).alias("sum_value"),
    )


def events_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``enriched_segment_stream``: hourly activity per
    customer market segment (stream-static enrichment join shape)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "c_mktsegment",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            r6(sum2dp(F.col("value"))).alias("sum_value"),
        )
    )


def view_click_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``view_click_stream_join``: every (click, view) pair of
    the same user with the view at most 30 minutes before the click.

    The range predicate rides on a user_id equi-join, so Catalyst plans a
    sort-merge join on user_id with the interval as a post-join filter —
    per-user fan-out is bounded by activity density, never all-pairs.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    return view_click_stream_join(views, clicks)


def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``dedup_events_stream``: earliest event per
    (user_id, event_type, hour), deterministic tiebreak on event_id."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.withColumn("ts_hour", F.date_trunc("hour", F.col("ts")))
    w = Window.partitionBy("user_id", "event_type", "ts_hour").orderBy(
        "ts", "event_id"
    )
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


ORACLES: dict[str, str] = {
    "events_by_segment": """
SELECT date_trunc('hour', e.ts) AS window_start, c.c_mktsegment,
       count(*) AS n_events,
       (round(sum(cast(round(e.value * 100) AS bigint)) / 100.0, 6) + 0.0) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
    "events_dedup": """
SELECT event_id, ts, user_id, event_type, value
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY user_id, event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    "events_sliding": """
SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS window_start,
       time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE
         + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       ((2 * sum(cast(round(value * 100) AS bigint)) * 10000 + count(*))
        // (2 * count(*))) / 1000000.0 AS avg_value
FROM (SELECT ts, event_type, value, unnest([0, 1]) AS k FROM events)
GROUP BY 1, 2, 3
""",
    "user_sessions": """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, cast(sum(new_session) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS bigint) AS session_no
  FROM lagged
)
SELECT user_id, session_no,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, (round((sum(cast(round(value * 100) AS bigint)) / 100.0), 6) + 0.0) AS sum_value
FROM numbered GROUP BY user_id, session_no
""",
    "view_click_pairs": """
SELECT c.user_id,
       c.event_id AS click_id, c.ts AS click_ts,
       v.event_id AS view_id, v.ts AS view_ts,
       (epoch_us(c.ts) - epoch_us(v.ts)) // 1000000 AS lag_seconds
FROM events c
JOIN events v
  ON v.user_id = c.user_id
 AND v.ts <= c.ts
 AND v.ts >= c.ts - INTERVAL 1800 SECOND
WHERE c.event_type = 'click' AND v.event_type = 'view'
""",
}

QUERIES = {
    "events_by_segment": events_by_segment,
    "events_dedup": events_dedup,
    "events_sliding": events_sliding,
    "user_sessions": user_sessions,
    "view_click_pairs": view_click_pairs,
}


# ---------------------------------------------------------------------------
# User-journey transition graph
# ---------------------------------------------------------------------------


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition graph of user journeys: for every
    consecutive event pair in a user's timeline, count (from_type,
    to_type) and emit the transition log-probability — the behavioral
    model behind funnel analysis (``event_funnel`` asks "did the ordered
    steps happen"; this asks "what does the crowd actually do next").

    Parity design: counts are integers; ``log_prob = ln(n_trans /
    n_from)`` is the log of an integer rational — irrational, so r6 is
    cross-engine safe (the repo's float convention).  Scale shape: one
    user-keyed window pass (the sessionization shuffle), then a
    type-pair groupBy map-side-combined into a #types^2-bounded table.
    """
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(order).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = steps.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n_trans")
    )
    outdeg = steps.groupBy("from_type").agg(
        F.count("*").cast("long").alias("n_from")
    )
    return trans.join(outdeg, "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        "n_from",
        r6(
            F.log(F.col("n_trans").cast("double") / F.col("n_from"))
        ).alias("log_prob"),
    )


ORACLES["event_transitions"] = """
WITH steps AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, cast(count(*) AS bigint) AS n_trans
  FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2
),
outdeg AS (
  SELECT from_type, cast(count(*) AS bigint) AS n_from
  FROM steps WHERE to_type IS NOT NULL GROUP BY 1
)
SELECT t.from_type, t.to_type, t.n_trans, o.n_from,
       (round(ln(cast(t.n_trans AS double) / o.n_from), 6) + 0.0) AS log_prob
FROM trans t JOIN outdeg o USING (from_type)
"""
QUERIES["event_transitions"] = event_transitions
