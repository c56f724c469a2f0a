"""Structured Streaming consistency: each streaming pipeline must agree with
its batch twin on the same events parquet (availableNow drains the source)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataanalytics_textsummarization_spark.functions import sum2dp
from bigdataanalytics_textsummarization_spark.io import load_table
from bigdataanalytics_textsummarization_spark.streaming import events as se
from tests.conftest import SF_DIR, normalize


def test_hourly_counts_stream_matches_batch(spark):
    stream = se.read_events_stream(spark, SF_DIR)
    got = se.run_stream_to_memory(
        spark, se.hourly_counts_stream(stream), "hourly_stream"
    ).toPandas()

    ev = load_table(spark, SF_DIR, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(sum2dp(F.col("value")), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .toPandas()
    )
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape
    assert g.equals(w)


def test_sessions_stream_matches_batch_sessionization(spark):
    stream = se.read_events_stream(spark, SF_DIR)
    got = se.run_stream_to_memory(
        spark, se.sessions_stream(stream), "sessions_stream"
    ).toPandas()

    want = (
        se.user_sessions(spark, SF_DIR)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .toPandas()
    )
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_running_user_totals_stateful(spark):
    stream = se.read_events_stream(spark, SF_DIR)
    sink = se.run_stream_to_memory(
        spark,
        se.running_user_totals_stream(stream),
        "running_totals",
        output_mode="update",
    )
    # update-mode sink: the final state per user is the row with max n_events
    got = (
        sink.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
    )
    want = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .toPandas()
    )
    g, w = normalize(got), normalize(want)
    assert g.equals(w)


def test_dedup_stream_matches_batch(spark):
    # the fixture parquet is written time-ordered per file, so first-arrival
    # == first-event-time and the streaming dedup must agree with the batch
    # twin on the surviving key set (not necessarily the same event_id when
    # several duplicates share one timestamp — compare keys + counts)
    stream = se.read_events_stream(spark, SF_DIR)
    got = se.run_stream_to_memory(
        spark,
        se.dedup_events_stream(stream),
        "dedup_stream",
        output_mode="append",
    )
    batch = se.events_dedup(spark, SF_DIR)
    assert got.count() == batch.count()
    g_keys = normalize(
        got.select(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
        ).toPandas()
    )
    b_keys = normalize(
        batch.select(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
        ).toPandas()
    )
    assert g_keys.equals(b_keys)


def test_enriched_segment_stream_matches_batch(spark):
    stream = se.read_events_stream(spark, SF_DIR)
    cust = load_table(spark, SF_DIR, "customer")
    got = se.run_stream_to_memory(
        spark,
        se.enriched_segment_stream(stream, cust),
        "segment_stream",
    ).toPandas()
    want = se.events_by_segment(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape
    assert g.equals(w)


def test_view_click_stream_join_matches_batch(spark):
    # stream-stream interval join (append mode) must produce exactly the
    # batch interval-join pairs when the source drains in order
    stream = se.read_events_stream(spark, SF_DIR)
    views = stream.filter(F.col("event_type") == "view")
    clicks = stream.filter(F.col("event_type") == "click")
    got = se.run_stream_to_memory(
        spark,
        se.view_click_stream_join(views, clicks),
        "view_click_stream",
        output_mode="append",
    ).toPandas()
    want = se.view_click_pairs(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_checkpointed_ingest_processes_only_new_files(spark, tmp_path):
    # exactly-once incremental ingest: second run after new files land must
    # process only the delta; the union of runs has no duplicates
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_DIR, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    total = ev.count()

    first.coalesce(1).write.mode("append").parquet(src)
    se.stream_parquet_ingest(spark, src, first.schema, sink, ckpt)
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()

    second.coalesce(1).write.mode("append").parquet(src)
    se.stream_parquet_ingest(spark, src, first.schema, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == total
    assert out.select("event_id").distinct().count() == total


def test_near_dup_ingest_stream_matches_batch(spark):
    # the ingest near-dup gate runs as a stateless stream-static join:
    # row-local signatures on the stream side vs the precomputed corpus
    # band index; append-mode result must equal the batch twin
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import dedup as dd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % dd.INGEST_MOD == 0)
    )
    docs = load_table(spark, SF_DIR, "documents")
    index = dd._band_keys(
        dd._wide_sigs_from_docs(
            docs.filter(F.col("doc_id") % dd.INGEST_MOD != 0)
        )
    ).localCheckpoint()  # materialized index, as a deployment would have
    got = se.run_stream_to_memory(
        spark,
        dd.near_dup_ingest_join(stream_docs, index),
        "near_dup_ingest_stream",
        output_mode="append",
    ).toPandas()
    want = dd.near_dup_ingest(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_stream_materialize_refreshes_to_batch_truth(spark, tmp_path):
    # the materialized table must equal the batch aggregate of whatever has
    # landed so far, after each catch-up run — and re-running with no new
    # data must be a no-op that leaves a consistent table
    import os

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_DIR, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    def agg_of(df):
        return (
            df.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"))
        )

    def run():
        stream = (
            spark.readStream.schema(first.schema).parquet(src)
        )
        se.stream_materialize(spark, agg_of(stream), sink, ckpt, "event_type")

    first.coalesce(1).write.mode("append").parquet(src)
    run()
    got1 = normalize(spark.read.parquet(sink).toPandas())
    want1 = normalize(agg_of(first).toPandas())
    assert got1.equals(want1)

    run()  # no new files: refresh is a no-op, table stays consistent
    assert normalize(spark.read.parquet(sink).toPandas()).equals(want1)

    second.coalesce(1).write.mode("append").parquet(src)
    run()
    got2 = normalize(spark.read.parquet(sink).toPandas())
    want2 = normalize(agg_of(ev).toPandas())
    assert got2.equals(want2)


def test_ppl_ingest_stream_matches_batch(spark):
    # the perplexity gate streams: row-local bigrams + stateless
    # stream-static LM left-joins; the per-doc rollup runs inside
    # foreachBatch (each doc is one input row, so the aggregation is
    # micro-batch-local — no cross-batch state), and the union of all
    # micro-batch outputs must equal the batch twin
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % ta.PPL_INGEST_MOD == 0)
    )
    docs = load_table(spark, SF_DIR, "documents")
    corpus_pair = (
        ta._doc_bigrams(docs.filter(F.col("doc_id") % ta.PPL_INGEST_MOD != 0))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint()  # materialized LM, as a deployment would have
    )
    corpus_uni = corpus_pair.groupBy("w1").agg(
        F.sum("c12").alias("c1")
    ).localCheckpoint()

    batches = []

    def score_batch(batch_df, _bid):
        batches.append(
            ta.ppl_ingest_score(batch_df, corpus_pair, corpus_uni).toPandas()
        )

    q = (
        stream_docs.writeStream.foreachBatch(score_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pandas as pd

    got = pd.concat(batches, ignore_index=True)
    want = ta.ppl_ingest(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_gopher_rules_stream_matches_batch(spark):
    # every rule signal is row-local array math, so the cleaning pass is a
    # stateless append-mode projection on a stream — no watermark, no state
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    got = se.run_stream_to_memory(
        spark,
        ta.gopher_rules_from(stream_docs),
        "gopher_rules_stream",
        output_mode="append",
    ).toPandas()
    want = ta.gopher_rules(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_clf_ingest_stream_matches_batch(spark):
    # the classifier gate is a pure row-local projection (HOF aggregate
    # over the token array inside the row), so it streams append-mode
    # with no watermark and no state; the admission decision itself is
    # integer-exact (s >= 0)
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % ta.PPL_INGEST_MOD == 0)
    )
    got = se.run_stream_to_memory(
        spark,
        ta.clf_ingest_score(stream_docs),
        "clf_ingest_stream",
        output_mode="append",
    ).toPandas()
    want = ta.clf_ingest(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_doc_chunks_stream_matches_batch(spark):
    # chunking is a stateless map-only projection (sequence+explode+slice),
    # so RAG chunk prep runs at ingest: append mode, no watermark, no state
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    got = se.run_stream_to_memory(
        spark,
        ta.doc_chunks_from(stream_docs),
        "doc_chunks_stream",
        output_mode="append",
    ).toPandas()
    want = ta.doc_chunks(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_event_transitions_semantics(spark):
    import math

    from bigdataanalytics_textsummarization_spark.io import load_table
    from bigdataanalytics_textsummarization_spark.streaming.events import (
        event_transitions,
    )
    from tests.conftest import SF_DIR

    out = event_transitions(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # out-degree reconciles: sum of transitions per from_type == n_from,
    # and n_from is constant within a from_type
    g = out.groupby("from_type")
    assert (g["n_trans"].sum() == g["n_from"].first()).all()
    # total transitions = total events minus one per multi-event user
    ev = load_table(spark, SF_DIR, "events").toPandas()
    per_user = ev.groupby("user_id")["event_id"].count()
    want_total = int((per_user - 1).clip(lower=0).sum())
    assert int(out["n_trans"].sum()) == want_total
    # log_prob recomputes from the shipped counts
    for r in out.itertuples():
        assert abs(
            r.log_prob - round(math.log(float(r.n_trans) / r.n_from), 6)
        ) < 1e-9


def test_event_transitions_stream_matches_batch(spark):
    """Stream==batch proof for the transition counts (r4 VERDICT task #6):
    counting the append-mode pair stream reproduces event_transitions'
    n_trans/n_from table exactly."""
    from bigdataanalytics_textsummarization_spark.streaming.events import (
        event_transitions,
        read_events_stream,
        transitions_pairs_stream,
    )
    from tests.conftest import SF_DIR

    pairs = se.run_stream_to_memory(
        spark,
        transitions_pairs_stream(read_events_stream(spark, SF_DIR)),
        "transitions_pairs_stream",
        output_mode="append",
    ).toPandas()
    got = (
        pairs.groupby(["from_type", "to_type"])
        .size()
        .rename("n_trans")
        .reset_index()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    want = (
        event_transitions(spark, SF_DIR)
        .toPandas()[["from_type", "to_type", "n_trans"]]
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    assert got.shape == want.shape
    assert got["from_type"].equals(want["from_type"])
    assert got["to_type"].equals(want["to_type"])
    assert (got["n_trans"].astype("int64") == want["n_trans"].astype("int64")).all()


def test_event_funnel_stream_matches_batch(spark):
    """Stream==batch proof for the first-touch funnel: the last emitted
    row per user from the stateful stream equals relational_ext's
    three-stage min-aggregation chain."""
    import pandas as pd

    from bigdataanalytics_textsummarization_spark.relational_ext import (
        event_funnel,
    )
    from bigdataanalytics_textsummarization_spark.streaming.events import (
        funnel_stream,
        read_events_stream,
    )
    from tests.conftest import SF_DIR

    emitted = se.run_stream_to_memory(
        spark,
        funnel_stream(read_events_stream(spark, SF_DIR)),
        "funnel_stream_sink",
        output_mode="update",
    ).toPandas()
    # fixpoint = the most-advanced row per user (steps is monotone and
    # timestamps never change once set)
    got = (
        emitted.sort_values(["user_id", "steps"], kind="mergesort")
        .groupby("user_id")
        .tail(1)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        event_funnel(spark, SF_DIR)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in ("user_id", "steps", "converted"):
        assert got[col].tolist() == want[col].tolist(), col
    for col in ("view_ts", "click_ts", "purchase_ts"):
        g = pd.to_datetime(got[col])
        w = pd.to_datetime(want[col])
        assert ((g == w) | (g.isna() & w.isna())).all(), col


def test_hourly_counts_accept_late_data_within_watermark(spark, tmp_path):
    """Out-of-order arrival proof: the LATER half of the events arrives in
    micro-batch 1 and the EARLIER half (all 'late' w.r.t. batch 1's max
    ts) in micro-batch 2; with a watermark wider than the disorder the
    windowed aggregate must still equal the batch truth — window state
    stays open for late rows instead of dropping them."""
    import os
    import time

    ev = load_table(spark, SF_DIR, "events").toPandas().sort_values("ts")
    # micros, not pandas-default nanos: the session may carry the
    # legacy nanosAsLong reader flag, which would surface ns ts as LONG
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    half = len(ev) // 2
    early, late_arriving_first = ev.iloc[:half], ev.iloc[half:]
    src = tmp_path / "events_src"
    src.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    f1 = str(src / "part1.parquet")  # later events, arrives first
    f2 = str(src / "part2.parquet")  # earlier events, arrives second
    pq.write_table(
        pa.Table.from_pandas(late_arriving_first, preserve_index=False), f1
    )
    pq.write_table(pa.Table.from_pandas(early, preserve_index=False), f2)
    now = time.time()
    os.utime(f1, (now - 60, now - 60))  # strictly older mtime -> batch 1
    os.utime(f2, (now, now))

    schema = spark.read.parquet(str(src)).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    )
    got = se.run_stream_to_memory(
        spark,
        se.hourly_counts_stream(sdf, watermark="1000 hours"),
        "hourly_late_stream",
    ).toPandas()

    want = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(sum2dp(F.col("value")), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .toPandas()
    )
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape
    assert g.equals(w)


def test_dsir_ingest_stream_matches_batch(spark):
    # the DSIR gate streams: row-local bucket hashing + ONE stateless
    # stream-static broadcast join against the frozen spine-complete
    # ratio table; the per-doc fold runs inside foreachBatch (each doc
    # is one input row, so the rollup is micro-batch-local), and the
    # union of all micro-batch outputs must equal the batch twin
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        curation as cu,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % cu.DSIR_INGEST_MOD == 0)
    )
    docs = load_table(spark, SF_DIR, "documents")
    lm = cu._dsir_lm(
        docs.filter(F.col("doc_id") % cu.DSIR_INGEST_MOD != 0)
    ).localCheckpoint()  # frozen ratio table, as a deployment would have

    batches = []

    def score_batch(batch_df, _bid):
        batches.append(cu.dsir_ingest_score(batch_df, lm).toPandas())

    q = (
        stream_docs.writeStream.foreachBatch(score_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pandas as pd

    got = pd.concat(batches, ignore_index=True)
    want = cu.dsir_ingest(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_phash_ingest_stream_matches_batch(spark):
    # the image-ingest near-dup gate runs as a stateless stream-static
    # join: Arrow-hash map stage + banding on the stream side vs the
    # precomputed corpus hash index; append-mode result must equal the
    # batch twin
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        multimodal as mm,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_media = mm._noisy_media(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % mm.IMG_INGEST_MOD == 0)
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    index = mm._phash_bands(
        mm._phash_frame(
            mm._noisy_media(
                docs.filter(F.col("doc_id") % mm.IMG_INGEST_MOD != 0)
            )
        ).select("doc_id", "phash")
    ).localCheckpoint()  # materialized index, as a deployment would have
    got = se.run_stream_to_memory(
        spark,
        mm.phash_ingest_join(stream_media, index),
        "phash_ingest_stream",
        output_mode="append",
    ).toPandas()
    want = mm.phash_ingest(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_audio_fp_ingest_stream_matches_batch(spark):
    # the acoustic twin of the image gate (VERDICT r12 task 2): stateless
    # wave-parse fingerprint map stage + banding on the stream side vs
    # the precomputed corpus fingerprint index; append-mode result must
    # equal the batch twin
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        multimodal as mm,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_media = mm._noisy_wav(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % mm.AUDIO_INGEST_MOD == 0)
    )
    docs = load_table(spark, SF_DIR, "documents")
    index = mm._audio_bands(
        mm._audio_fp_frame(
            mm._noisy_wav(
                docs.filter(F.col("doc_id") % mm.AUDIO_INGEST_MOD != 0)
            )
        ).select("doc_id", "fp")
    ).localCheckpoint()  # materialized index, as a deployment would have
    got = se.run_stream_to_memory(
        spark,
        mm.audio_fp_ingest_join(stream_media, index),
        "audio_fp_ingest_stream",
        output_mode="append",
    ).toPandas()
    want = mm.audio_fp_ingest(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_video_fp_ingest_stream_matches_batch(spark):
    # the video gate (ingest parity across all four modalities): the
    # per-frame hash is a stateless 1->k mapInPandas stage, banding is
    # per-row, and the (frame_idx, band, band_bits) join against the
    # precomputed per-frame index is stream-static; append-mode result
    # must equal the batch twin
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        multimodal as mm,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_media = mm._noisy_video(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % mm.VIDEO_INGEST_MOD == 0)
    )
    docs = load_table(spark, SF_DIR, "documents")
    index = mm._phash_bands(
        mm._video_fp_frame(
            mm._noisy_video(
                docs.filter(F.col("doc_id") % mm.VIDEO_INGEST_MOD != 0)
            )
        )
    ).localCheckpoint()  # materialized index, as a deployment would have
    got = se.run_stream_to_memory(
        spark,
        mm.video_fp_ingest_join(stream_media, index),
        "video_fp_ingest_stream",
        output_mode="append",
    ).toPandas()
    want = mm.video_fp_ingest(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_embedding_ingest_stream_matches_batch(spark):
    # the vector-store ingest gate (parity across every modality with a
    # batch dedup path): per-row cast/norm/sign-bucket on the stream side
    # vs the precomputed corpus bucket index; the stateless stream-static
    # bucket join's append-mode result must equal the batch twin
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        similarity as sim,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    stream_vecs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(SF_DIR)
        .filter(F.col("vec_id") % sim.EMB_INGEST_MOD == 0)
        .select("vec_id", "embedding")
    )
    index = (
        sim._embeddings(spark, SF_DIR)
        .withColumn("nrm", sim._norm(F.col("e")))
        .withColumn("bucket", sim._bucket(F.col("e")))
        .filter(F.col("vec_id") % sim.EMB_INGEST_MOD != 0)
        .localCheckpoint()  # materialized index, as a deployment would have
    )
    got = se.run_stream_to_memory(
        spark,
        sim.embedding_ingest_join(stream_vecs, index),
        "embedding_ingest_stream",
        output_mode="append",
    ).toPandas()
    want = sim.embedding_ingest(spark, SF_DIR).toPandas()
    assert len(want) > 0  # the gate must actually flag at the fixture scale
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)
    # the production-width gate rides the SAME join — prove stream==batch
    # at the wide key too
    index_w = (
        sim._embeddings(spark, SF_DIR)
        .withColumn("nrm", sim._norm(F.col("e")))
        .withColumn(
            "bucket", sim._bucket_of(F.col("e"), sim.SIGN_DIMS_WIDE)
        )
        .filter(F.col("vec_id") % sim.EMB_INGEST_MOD != 0)
        .localCheckpoint()
    )
    got_w = se.run_stream_to_memory(
        spark,
        sim.embedding_ingest_join(
            stream_vecs, index_w, dims=sim.SIGN_DIMS_WIDE
        ),
        "embedding_ingest_wide_stream",
        output_mode="append",
    ).toPandas()
    want_w = sim.embedding_ingest_wide(spark, SF_DIR).toPandas()
    g, w = normalize(got_w), normalize(want_w)
    assert g.shape == w.shape, f"wide: {g.shape} != {w.shape}"
    assert g.equals(w)


def test_phash_ingest_wide_stream_matches_batch(spark):
    # the production-width image gate (r15): the SAME shared join
    # builder at wide=True — aHash-64 Arrow map stage + 16-bit banding
    # on the stream side vs the precomputed wide corpus index;
    # append-mode result must equal the batch twin
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark.extensions import (
        multimodal as mm,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_media = mm._noisy_media_wide(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % mm.IMG_INGEST_MOD == 0)
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    index = mm._wide_bands(
        mm._phash_wide_frame(
            mm._noisy_media_wide(
                docs.filter(F.col("doc_id") % mm.IMG_INGEST_MOD != 0)
            )
        ).select("doc_id", "phash"),
        "phash",
    ).localCheckpoint()  # materialized index, as a deployment would have
    got = se.run_stream_to_memory(
        spark,
        mm.phash_ingest_join(stream_media, index, wide=True),
        "phash_ingest_wide_stream",
        output_mode="append",
    ).toPandas()
    want = mm.phash_ingest_wide(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)


def test_wer_ingest_stream_matches_batch(spark):
    # the WER admission gate runs as a stateless stream-static join
    # (arriving candidates vs the materialized reference corpus)
    # followed by the zero-shuffle Arrow DP kernel; append-mode result
    # must equal the batch twin, keep decisions included
    from pyspark.sql import types as T

    from bigdataanalytics_textsummarization_spark import rouge as R

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream_docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % 2 == 0)
    )
    refs = R.wer_ingest_refs(spark, SF_DIR).localCheckpoint()
    got = se.run_stream_to_memory(
        spark,
        R.wer_ingest_score(stream_docs, refs),
        "wer_ingest_stream",
        output_mode="append",
    ).toPandas()
    want = R.wer_ingest(spark, SF_DIR).toPandas()
    g, w = normalize(got), normalize(want)
    assert g.shape == w.shape, f"{g.shape} != {w.shape}"
    assert g.equals(w)
    assert w["keep"].any() and not w["keep"].all()  # the gate discriminates
