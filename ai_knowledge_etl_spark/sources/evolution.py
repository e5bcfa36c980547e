"""Schema evolution across table versions (connector-level concern: an
incremental pipeline appends batches whose schema drifts — added columns
must read as NULL for old files, not break the scan).

Two layers, both Spark built-ins surfaced deliberately:
- file level: `spark.read.option("mergeSchema", true)` unifies parquet
  footers across batch directories (read_merged);
- frame level: `unionByName(allowMissingColumns=True)` is the same
  semantic for in-flight DataFrames (union_evolved).

At 100 TB mergeSchema's footer reconciliation is a driver-side metadata
pass; the data read stays columnar and pruned. Columns absent in a file
are materialized as NULL vectors, costing nothing on disk.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def read_merged(spark: SparkSession, *paths: str) -> DataFrame:
    """Read several parquet batch dirs with schema merging (added
    columns NULL-fill for older batches)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def union_evolved(*frames: DataFrame) -> DataFrame:
    """Union DataFrames whose schemas drifted (by column name, missing
    columns NULL-filled)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )
