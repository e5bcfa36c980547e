"""Event-time windowed operators over the `events` stream stand-in
(SURVEY §2.J stream-session-events; no reference analog — the crawl has
wall-clock stamps only, crawler-queue.sh:131).

`ts` arrives as int64 epoch nanoseconds (see sources/catalog.py). The batch
operators below use integer second arithmetic (engine-portable for the
oracle); the Structured Streaming variants use the native `window`/
`session_window`/`withWatermark` built-ins over a proper timestamp and are
exercised in tests/test_streaming.py with Trigger.AvailableNow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NS = 1_000_000_000


def ts_seconds() -> Column:
    """Integer epoch seconds from the ns column — `div` keeps it exact
    (a double round-trip would lose precision above 2^53 ns)."""
    return F.expr(f"ts div {NS}")


def tumbling_counts(events: DataFrame, width_s: int = 600) -> DataFrame:
    """Tumbling windows: (window_start_s, event_type) → count, sum(value)."""
    win = (F.expr(f"ts div {NS} div {width_s}") * width_s).alias("window_start_s")
    return (
        events.groupBy(win, "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def sliding_counts(
    events: DataFrame, width_s: int = 600, slide_s: int = 300
) -> DataFrame:
    """Sliding windows via explode over the window offsets each event
    belongs to (width/slide assignments per event)."""
    n_offsets = width_s // slide_s
    exploded = events.select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(n_offsets - 1))).alias("off"),
        F.expr(f"ts div {NS} div {slide_s}").alias("slot"),
    ).select(
        "event_type",
        "value",
        ((F.col("slot") - F.col("off")) * slide_s).alias("window_start_s"),
    )
    return exploded.groupBy("window_start_s").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


def session_windows(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the gap
    to the previous event exceeds `gap_s`. lag + running conditional sum —
    the batch twin of `session_window` in Structured Streaming."""
    # order by (sec, event_id), not raw ns — the oracle sees only seconds, so
    # same-second ties must break identically in both engines
    w_order = Window.partitionBy("user_id").orderBy(F.asc("sec"), F.asc("event_id"))
    with_gap = events.select(
        "user_id", "event_id", "value", ts_seconds().alias("sec")
    ).withColumn(
        "new_session",
        F.when(
            (F.col("sec") - F.lag("sec").over(w_order)) > gap_s, 1
        ).otherwise(0),
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = with_gap.withColumn(
        "session_id", F.sum("new_session").over(w_run).cast("int")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("sec").cast("bigint").alias("session_start_s"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


# --- Structured Streaming variants (tested with Trigger.AvailableNow) ----------


def with_event_time(events: DataFrame) -> DataFrame:
    """ns epoch → proper TimestampType column for native streaming windows."""
    return events.withColumn(
        "event_time", F.timestamp_seconds(F.expr(f"ts div {NS}"))
    )


def streaming_tumbling_counts(
    stream: DataFrame, width: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Native streaming tumbling window with a watermark for late data
    (SURVEY §2.J coverage note: watermarking is a Spark built-in)."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", width).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def streaming_session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "60 minutes"
) -> DataFrame:
    """Native streaming session windows (session_window + watermark)."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(
            F.session_window("event_time", gap).alias("win"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"), "user_id", "n_events"
        )
    )


def foreach_batch_upsert(
    stream: DataFrame,
    path: str,
    key: str = "event_id",
    rev_col: str = "ts",
    n_buckets: int = 16,
):
    """Exactly-once streaming sink on plain parquet: every micro-batch is
    MERGEd into a bucket-partitioned table via the incremental file-level
    upsert (operators/incremental.upsert_parquet). The merge keeps the
    max-`rev_col` row per key, so replaying a batch after a failure — the
    at-least-once delivery Structured Streaming guarantees for foreachBatch
    — converges to the same table instead of duplicating rows: idempotent
    writes + replayed source = effectively-exactly-once end to end.

    Scale: each micro-batch touches only the hash-buckets its keys land in
    (partition-pruned read-back + dynamic overwrite of exactly those
    directories), so sink IO is proportional to the batch, not the table.
    Returns the StreamingQuery; caller awaits termination."""
    from ai_knowledge_etl_spark.operators import incremental

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        incremental.upsert_parquet(
            batch_df.sparkSession,
            path,
            batch_df,
            key=key,
            rev_col=rev_col,
            n_buckets=n_buckets,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_within_watermark(
    stream: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """At-least-once delivery → exactly-once processing:
    dropDuplicatesWithinWatermark keyed on event_id. The watermark bounds
    the dedup state — a key is evicted once the stream is `watermark` past
    its event time, so state is O(events per watermark window), not
    O(all events ever) (plain streaming dropDuplicates grows forever).
    Batch twin with oracle: registry/streaming.py stream-dedup-watermark."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )


def streaming_interval_join(
    clicks: DataFrame,
    errors: DataFrame,
    window_s: int = 60,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: clicks within `window_s` after an error
    by the same user (SURVEY §2.J — Spark's stream-stream join with
    watermarks on BOTH sides bounds the buffered state; the range
    condition lets the engine evict rows older than watermark+window).
    Batch twin: registry relational.py join-range-window.
    """
    e = (
        with_event_time(errors)
        .withWatermark("event_time", watermark)
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col("event_time").alias("err_time"),
        )
    )
    c = (
        with_event_time(clicks)
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("clk_user"),
            F.col("event_time").alias("clk_time"),
        )
    )
    return e.join(
        c,
        (F.col("err_user") == F.col("clk_user"))
        & (F.col("clk_time") >= F.col("err_time"))
        & (F.col("clk_time") < F.col("err_time") + F.expr(f"INTERVAL {window_s} seconds")),
    ).select("err_id", "err_user", "err_time", "clk_time")
