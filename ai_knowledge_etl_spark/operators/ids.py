"""Scale-safe sequential id assignment (SURVEY §2.G window-page-id).

The reference numbers visited pages 001, 002, … from a driver-side counter
(reference: crawler-queue.sh:172-176). The naive distributed twin is a
global `row_number() OVER (ORDER BY …)` — correct, but it funnels every row
through ONE reducer (SinglePartition WindowExec), which dies at 100 TB.

The scale-safe plan is the classic two-pass partition-offset scheme:

1. Range-repartition by the order columns, so partition p holds a
   contiguous range and every row in partition p sorts before every row in
   partition p+1. `localCheckpoint(eager=True)` pins the partitioning —
   both subsequent passes must observe the *same* partition boundaries, and
   re-running the (sampled) range exchange per action could move them.
2. Count rows per partition (tiny: one row per partition) and fold the
   counts into exclusive prefix offsets on the driver. This is the one
   driver-side step, bounded by the partition count — never by the data.
3. Broadcast the offsets back and add a partition-local
   `row_number() OVER (PARTITION BY pid ORDER BY …)`. Every reducer
   numbers only its own slice; global id = local rank + partition offset.

The ordered-window SQL formulation stays as the differential oracle: both
produce identical ids because the order columns are a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "seq_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add 1-based dense sequential ids in `order_cols` order without a
    single-reducer global window. `order_cols` must be a total order
    (unique tiebreak) for ids to be deterministic.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = df.repartitionByRange(num_partitions, *[F.asc(c) for c in order_cols])
    # Pin partition boundaries: the range exchange samples its bounds, and
    # pass 2 (counts) + pass 3 (final) must see identical placement.
    parts = parts.localCheckpoint(eager=True)
    stamped = parts.withColumn("__pid", F.spark_partition_id())
    # One row per partition — bounded by num_partitions, not by the data.
    counts = stamped.groupBy("__pid").agg(F.count("*").alias("__n")).collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["__n"]
    off_df = spark.createDataFrame(offsets, schema="__pid int, __off bigint")
    w = Window.partitionBy("__pid").orderBy(*[F.asc(c) for c in order_cols])
    return (
        stamped.join(F.broadcast(off_df), "__pid")
        .withColumn(
            id_col, (F.row_number().over(w) + F.col("__off")).cast("bigint")
        )
        .drop("__pid", "__off")
    )


def running_max_two_pass(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix-max of `value_col` in `order_cols` order (the
    streaming-watermark shape: watermark before row i = max event time seen
    strictly earlier in arrival order) without a single-reducer window.

    Same two-pass scheme as `assign_sequential_ids`: range-partition on the
    order columns, per-partition max (one row per partition), driver-side
    exclusive prefix-max over those, broadcast back, then a partition-local
    exclusive running max. Row 1's prefix is NULL (no prior observation),
    matching `max(v) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND
    1 PRECEDING)` — which stays as the differential-oracle formulation.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = df.repartitionByRange(num_partitions, *[F.asc(c) for c in order_cols])
    parts = parts.localCheckpoint(eager=True)  # pin boundaries across passes
    stamped = parts.withColumn("__pid", F.spark_partition_id())
    maxes = (
        stamped.groupBy("__pid").agg(F.max(value_col).alias("__mx")).collect()
    )
    prefix, acc = [], None
    for row in sorted(maxes, key=lambda r: r["__pid"]):
        prefix.append((row["__pid"], acc))
        acc = row["__mx"] if acc is None or row["__mx"] > acc else acc
    field = df.schema[value_col].dataType.simpleString()
    off_df = spark.createDataFrame(prefix, schema=f"__pid int, __pre {field}")
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    return (
        stamped.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.greatest(local, F.col("__pre")))
        .drop("__pid", "__pre")
    )
