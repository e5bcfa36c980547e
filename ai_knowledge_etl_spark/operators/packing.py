"""Sequence packing for LLM pretraining (SURVEY §2.I extension).

Concat-and-chunk packing — the GPT-style recipe: concatenate documents
in a deterministic order, then cut the token stream into fixed
`budget`-token context windows. Per document we compute which windows it
lands in (first/last window id, span count) from an EXCLUSIVE running
token cumsum — one window function, one shuffle on the stream key.

Scale: the cumsum is per-stream (`partition_col`); a 100 TB corpus packs
as thousands of independent streams (per source/shard), so no global
ordering bottleneck exists. A true bin-packing (first-fit decreasing)
would need sequential state; concat-and-chunk is what production
pretraining pipelines actually use because it wastes zero tokens and
stays embarrassingly parallel per stream.

Reference: no packing surface in the reference; training-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concat_chunk_pack(
    df: DataFrame,
    order_col: str,
    tok_col: str,
    budget: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Adds `cum_prev` (tokens before this doc in its stream),
    `first_window` / `last_window` (window ids this doc's tokens fall
    into) and `n_windows` (how many context windows the doc straddles)."""
    w = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    cum_prev = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    first = F.floor(cum_prev / budget)
    last = F.floor((cum_prev + F.col(tok_col) - 1) / budget)
    return (
        df.withColumn("cum_prev", cum_prev.cast("long"))
        .withColumn("first_window", first.cast("long"))
        .withColumn("last_window", last.cast("long"))
        .withColumn(
            "n_windows", (last - first + F.lit(1)).cast("long")
        )
    )
