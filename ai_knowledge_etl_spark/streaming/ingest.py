"""Streaming WARC ingestion — the 100 TB arrival path as a file stream.

Common-Crawl-shaped corpora land as WARC files over time; the batch twin
(`sources/warc.scan_warc_text`) parses a static snapshot, while this module
runs the same parser inside Structured Streaming: a parquet file-stream of
(file_id, content binary) blobs → Arrow-batched record parse per
micro-batch → idempotent MERGE into a uri-keyed corpus table
(operators/incremental.upsert_parquet via the foreachBatch discipline of
streaming/events.foreach_batch_upsert).

Exactly-once story, both layers exercised by the registered query:
  - the checkpoint deduplicates FILES (a second availableNow run skips
    already-processed paths), and
  - the MERGE deduplicates CONTENT (re-delivered blobs under new
    filenames — the at-least-once case checkpoints can't catch —
    converge to the same table because the upsert keeps one row per uri).

`binaryFile` is not a streaming source, so arriving WARC blobs are staged
as parquet rows — which is also the honest production shape: a manifest
table of (file, bytes) that downstream systems can replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def warc_ingest_availablenow(
    spark: SparkSession,
    staging_dir: str,
    table_path: str,
    ckpt_dir: str,
    n_buckets: int = 8,
) -> None:
    """One availableNow pass: parse every not-yet-processed staged WARC
    blob and MERGE its records into the uri-keyed corpus table."""
    from ai_knowledge_etl_spark.operators import incremental
    from ai_knowledge_etl_spark.sources import warc

    stream = spark.readStream.schema("file_id long, content binary").parquet(
        staging_dir
    )

    def sink(batch: DataFrame, epoch_id: int) -> None:
        # Real monotonic revision (round-3 advisor): the streaming epoch_id
        # is the arrival clock, so a shorter NEWER text re-delivered in a
        # later wave beats an older longer one — "merge_latest keeps max
        # rev" now actually means recency. octet_length stays as the
        # within-epoch tiebreaker (a uri seen twice in one micro-batch
        # resolves deterministically), packed into the low 40 bits.
        records = warc.scan_warc_text(batch).select(
            "uri",
            "text",
            (
                F.lit(int(epoch_id)).cast("long") * F.lit(1 << 40).cast("long")
                + F.least(
                    F.octet_length("text").cast("long"),
                    F.lit((1 << 40) - 1).cast("long"),
                )
            ).alias("rev"),
        )
        incremental.upsert_parquet(
            batch.sparkSession,
            table_path,
            records,
            key="uri",
            rev_col="rev",
            n_buckets=n_buckets,
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cms_grid_availablenow(
    spark: SparkSession,
    staging_dir: str,
    grid_dir: str,
    ckpt_dir: str,
    depth: int = 4,
    width: int = 1024,
) -> None:
    """One availableNow pass: build a count-min grid over every
    not-yet-processed staged event file and publish it under the batch's
    epoch directory.

    Additive sketches are NOT idempotent under at-least-once delivery —
    a replayed micro-batch would double-count — so the publish unit is
    the per-epoch grid, written with mode=overwrite to an epoch-keyed
    path: a retried epoch REPLACES its own grid instead of adding to it
    (the same epoch-idempotence discipline as the MERGE sink above, for
    a sink where upsert semantics don't apply). Day-grain production
    layout is identical: one grid directory per day, summed cell-wise at
    query time."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators import sketches as SK

    stream = spark.readStream.schema("event_id long, user_id long").parquet(
        staging_dir
    )

    def sink(batch: DataFrame, epoch_id: int) -> None:
        keyed = (
            batch.select(F.col("user_id").cast("string").alias("key"))
            .groupBy("key")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        grid = SK.cms_table(keyed, "key", "cnt", depth=depth, width=width)
        grid.write.mode("overwrite").parquet(
            f"{grid_dir}/epoch_{int(epoch_id)}"
        )

    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
