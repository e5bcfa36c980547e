"""Streaming upsert sink: foreachBatch → incremental parquet MERGE
(SURVEY §2.J × incremental roadmap — the lakehouse ingestion idiom:
micro-batches land as upserts into a bucket-partitioned table, not
appends, so the table is always the LATEST state per key).

Each micro-batch is first collapsed to one row per key (latest revision
inside the batch — foreachBatch gives no intra-batch ordering), then
merged via operators/incremental.upsert_parquet, which rewrites only the
key-buckets the batch touches. State volume on the stream side is zero:
all history lives in the table, so a 100 TB keyspace costs the executors
nothing between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import incremental


def latest_per_key(batch: DataFrame, key: str, rev_col: str) -> DataFrame:
    """Collapse a micro-batch to its newest row per key (deterministic:
    revision desc, then key-ordering tiebreak on all columns via the
    rev column only — callers pass a strictly-ordered rev like event ts)."""
    w = Window.partitionBy(key).orderBy(F.desc(rev_col))
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def start_upsert_stream(
    stream: DataFrame,
    path: str,
    key: str,
    rev_col: str,
    n_buckets: int = 16,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Start a foreachBatch upsert stream into `path`. Returns the
    StreamingQuery (caller awaits/stops)."""

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        collapsed = latest_per_key(batch_df, key, rev_col)
        incremental.upsert_parquet(
            batch_df.sparkSession,
            path,
            collapsed,
            key=key,
            rev_col=rev_col,
            n_buckets=n_buckets,
        )

    writer = stream.writeStream.foreachBatch(apply_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
