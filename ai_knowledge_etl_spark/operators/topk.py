"""Top-k operators (SURVEY §2.F).

Global top-k (`orderBy().limit()`) compiles to TakeOrderedAndProject — a
per-partition heap + driver merge, no global sort, so it scales to any input
size. Per-group top-k uses a ranking window, which shuffles once on the
group key; at 100 TB pre-aggregate or bucket on the group key to keep that
shuffle healthy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k with a deterministic ordering (pass tiebreak columns!).

    Reference: crawler-summarizer.md:101-104 (top-10 report pages).
    """
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], k: int, *order: Column
) -> DataFrame:
    """Top-k rows per group via row_number (reference:
    commands/extract.md:489 — max 5 images per page)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
