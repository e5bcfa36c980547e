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
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Add a `batch_id` column: floor(exclusive-prefix-sum(size) / max_bytes)
    over rows sorted smallest-first (reference: DESIGN.md:740-741).

    With `partition_cols` (the scale path — e.g. crawl/session id), packing
    runs independently inside each partition: one window group per session,
    distributed across reducers, and `batch_id` is session-local. Without
    it, the window is global — a single-reducer step acceptable only for
    session-capped planner state (the reference's ≤100-task cap).
    """
    if partition_cols:
        w = (
            Window.partitionBy(*partition_cols)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
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


def batch_rollup(
    df_with_batches: DataFrame,
    size_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-batch totals (reference: DESIGN.md:736-763 batch aggregates).
    `group_cols` carries the session key when packing was partitioned."""
    return df_with_batches.groupBy(*(group_cols or []), "batch_id").agg(
        F.count("*").alias("n_tasks"),
        F.sum(F.col(size_col).cast("decimal(18,2)"))
        .cast("double")
        .alias("batch_bytes"),
    )
