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
