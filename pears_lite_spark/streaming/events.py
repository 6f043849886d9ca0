"""Watermarked windowed aggregation over the events stream.

The index itself needs no watermark (no event-time aggregation —
SURVEY.md §2.10), but the engine exposes the standard late-data
pattern for the `events` table: readStream -> withWatermark ->
tumbling-window agg -> append sink. With Trigger.AvailableNow and
on-time data the result equals the batch `events_hourly` aggregate
(asserted in pytest); with late data, rows later than the watermark
are dropped exactly per Structured Streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """(event_type, window_start, n, sum_value) with event-time windows;
    works on both batch and streaming DataFrames (same plan — the
    batch twin is the oracle)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy("event_type",
                        F.window("ts", window).alias("w"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value_r"))
            .select("event_type", F.col("w.start").alias("window_start"),
                    "n", "sum_value_r"))


def session_windows(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Gap-based session aggregation per event_type (F.session_window —
    Catalyst's native sessionization; batch and streaming share the
    plan). A new session starts when an event arrives >= gap after the
    previous one. (event_type, session_start, n, sum_value_r).

    Known upstream hazard (observed on Spark 4.1): an anti/semi join
    keyed on the session start can be pushed BELOW this aggregation by
    the PushDownLeftSemiAntiJoin optimizer rule, where it filters
    PARTIAL (pre-merge) sessions on their not-yet-final start and
    silently splits sessions. Materialize (cache/checkpoint) this
    result before anti/semi-joining on `session_start`, or exclude that
    rule for the query."""
    return (events.groupBy("event_type",
                           F.session_window("ts", gap).alias("w"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value_r"))
            .select("event_type", F.col("w.start").alias("session_start"),
                    "n", "sum_value_r"))


SESSION_OUT = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("n", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

# open-session state: start/last as epoch microseconds
SESSION_STATE = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])


def sessionize_stateful(events: DataFrame, gap_seconds: int = 600,
                        watermark: str = "1 seconds") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key
    sessionization with explicit open-session state and event-time
    timeouts — the escape hatch for session logic Catalyst's
    session_window can't express (per-session custom finalization,
    emit-on-close). Closed sessions are APPENDED as soon as a later
    event proves the gap passed; the open tail session lives in the
    state store and is flushed when the watermark times it out."""
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        etype = key[0]

        def emit(s):
            return pd.DataFrame({
                "event_type": [etype],
                "session_start": [pd.Timestamp(s[0], unit="us")],
                "n": [s[2]],
                "sum_value": [s[3]]})

        if state.hasTimedOut:
            s = tuple(state.get)
            state.remove()
            yield emit(s)
            return
        rows = pd.concat(list(pdfs))
        # robust to pandas delivering datetime64[ns] or [us]
        ts_ns = rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
        order = ts_ns.argsort(kind="stable")
        ts_us = ts_ns[order] // 1000
        vals = rows["value"].to_numpy()[order]
        cur = tuple(state.get) if state.exists else None
        for t, v in zip(ts_us, vals):
            if cur is None:
                cur = (int(t), int(t), 1, float(v))
            elif t - cur[1] >= gap_us:
                yield emit(cur)            # gap passed: close previous
                cur = (int(t), int(t), 1, float(v))
            else:
                cur = (cur[0], int(t), cur[2] + 1, cur[3] + float(v))
        if cur is None:
            return  # defensive: nothing delivered, nothing to keep
        state.update(cur)
        # event-time timeout: fires once the watermark passes last+gap
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)

    src = events.withWatermark("ts", watermark) if events.isStreaming \
        else events
    return (src.groupBy("event_type")
            .applyInPandasWithState(fn, SESSION_OUT, SESSION_STATE,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))


def stream_sessionize(spark: SparkSession, events_dir: str, out_path: str,
                      checkpoint_dir: str, gap_seconds: int = 600):
    """Drain `events_dir` through the stateful sessionizer into an
    append-mode parquet of closed sessions."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(events_dir))
    out = sessionize_stateful(stream, gap_seconds=gap_seconds)
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start(out_path))
    q.awaitTermination()
    return q


def stream_event_counts(spark: SparkSession, events_dir: str,
                        out_path: str, checkpoint_dir: str,
                        window: str = "1 hour",
                        watermark: str = "2 hours"):
    """Drain `events_dir` (parquet files of EVENTS_SCHEMA) into an
    append-mode parquet of finalized windows; returns the query after
    Trigger.AvailableNow completion. Append mode emits a window only
    once the watermark passes it — the exactly-once finalized-window
    contract a downstream consumer wants."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(events_dir))
    agg = windowed_event_counts(stream, window, watermark)
    q = (agg.writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start(out_path))
    q.awaitTermination()
    return q


# --------------------------------------------------------- streaming dedup

DEDUP_OUT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text_md5", T.StringType()),
])

DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def dedup_stateful(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup (the streaming twin of `dedup.exact_dedup`
    and the reference's dedup-before-insert, P4): the FIRST arrival of
    each md5(text) passes through, every later duplicate — same or any
    later micro-batch — is dropped. State is one boolean per distinct
    key. Within a micro-batch the lowest doc_id wins (deterministic);
    across batches, arrival order wins (streaming semantics).

    Scale note: state grows with distinct keys (16 B + key per doc).
    At web scale bound it with a key-TTL timeout (duplicates arrive
    close together in crawl streams) or shard the stream by key range
    and periodically compact state against the indexed corpus —
    NoTimeout here keeps the operator's semantics exact for tests."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:           # seen in an earlier micro-batch
            return
        rows = pd.concat(list(pdfs))
        state.update((True,))
        yield pd.DataFrame({
            "doc_id": [int(rows["doc_id"].min())],
            "text_md5": [key[0]]})

    keyed = docs.withColumn("text_md5", F.md5(F.col("text")))
    return (keyed.groupBy("text_md5")
            .applyInPandasWithState(fn, DEDUP_OUT, DEDUP_STATE,
                                    "append", GroupStateTimeout.NoTimeout))


def stream_dedup(spark: SparkSession, docs_dir: str, out_path: str,
                 checkpoint_dir: str, schema=None):
    """Drain `docs_dir` through the stateful dedup into an append-mode
    parquet of first-occurrence (doc_id, text_md5) rows."""
    if schema is None:
        schema = T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType())])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(docs_dir))
    out = dedup_stateful(stream)
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start(out_path))
    q.awaitTermination()
    return q
