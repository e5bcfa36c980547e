"""Batch planning (SURVEY §2.G window-batch-assign, §2.K plan-batches).

The reference greedily packs tasks into batches of ≤5 files / ≤1 MB
(reference: DESIGN.md:729-763). Exact greedy packing is order-dependent
sequential logic; the scalable re-expression is a running-total window:
sort by size, take the prefix sum, and cut batches at every `max_bytes`
boundary. This deviates from exact greedy (a batch may slightly overflow
the byte cap at the boundary item — the reference itself tolerates this by
packing at most 100 tasks), but it is deterministic, one shuffle, and works
at any scale.

Sums run over DECIMAL so the prefix total is exact — float window sums are
association-order-dependent and would make batch boundaries nondeterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config


def assign_batches(
    df: DataFrame,
    size_col: str,
    order_cols: list[str],
    max_bytes: int = config.BATCH_MAX_BYTES,
) -> DataFrame:
    """Add a `batch_id` column: floor(exclusive-prefix-sum(size) / max_bytes)
    over rows sorted smallest-first (reference: DESIGN.md:740-741).

    NOTE: the window is global (unpartitioned) — inherently a single-reducer
    step, matching the reference's ≤100-task session cap. For unbounded
    inputs, partition first (e.g. by crawl/session id) and pack per
    partition.
    """
    w = (
        Window.orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running_before = F.coalesce(
        F.sum(F.col(size_col).cast("decimal(18,2)")).over(w),
        F.lit(0).cast("decimal(18,2)"),
    )
    return df.withColumn(
        "batch_id",
        F.floor(running_before.cast("double") / max_bytes).cast("bigint"),
    )


def batch_rollup(df_with_batches: DataFrame, size_col: str) -> DataFrame:
    """Per-batch totals (reference: DESIGN.md:736-763 batch aggregates)."""
    return df_with_batches.groupBy("batch_id").agg(
        F.count("*").alias("n_tasks"),
        F.sum(F.col(size_col).cast("decimal(18,2)"))
        .cast("double")
        .alias("batch_bytes"),
    )
