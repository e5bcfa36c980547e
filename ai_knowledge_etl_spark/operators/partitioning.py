"""Partitioning toolbox for 100 TB joins: bucketed co-location and skew
salting (SURVEY §4 / prompt mandate: co-locate joins via bucketing, salt
skewed keys).

- `write_bucketed` / bucketed tables: both sides bucketed+sorted on the join
  key land co-partitioned on disk, so the join plans with ZERO Exchange —
  the shuffle is paid once at write time and amortized over every subsequent
  join. This is the links⋈pages⋈visited strategy at web scale: bucket all
  three state tables by normalized URL hash.
- `salted_join`: a skewed hot key (one domain with 10M pages) floods one
  reducer in a plain shuffle join. Salting splits each left key into
  `n_salts` synthetic sub-keys and replicates the right side per salt:
  shuffle width × n_salts, hot-key reducer ÷ n_salts. AQE's skew-join split
  handles moderate skew automatically; explicit salting is for the
  pathological tail (and for deterministic tests of it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
) -> None:
    """Persist as a bucketed+sorted table (spark_catalog managed).
    Drops any previous table AND its orphaned location first — a crashed
    session can leave the directory behind without the catalog entry."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables — plans with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join with the left side's hot keys spread over n_salts
    sub-keys and the right side replicated per salt. Result is identical to
    `left.join(right, key)` (verified in tests); only the shuffle layout
    changes."""
    salted_left = left.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, [key, "__salt"])
    return out.drop("__salt")


def zorder_key(a: str, b: str, bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of two non-negative int columns already
    bucketized to [0, 2^bits): bit i of `a` lands at position 2i, bit i of
    `b` at 2i+1. Range-partitioning + sorting by this key clusters BOTH
    dimensions at once, so per-file min/max stats stay narrow on EITHER
    column and a selective filter on either one prunes most files — the
    multi-dimension layout trick single-column sort can't give (sorting by
    `a` leaves every file spanning the full range of `b`). Pure bit
    arithmetic, whole-stage-codegen friendly; disjoint bit positions make
    `+` equivalent to `|`."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright(CAST({a} AS BIGINT), {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright(CAST({b} AS BIGINT), {i}) & 1, {2 * i + 1})")
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write parquet range-partitioned and sorted by the z-order key of
    (a, b) — both assumed bucketized to [0, 2^bits). Each output file then
    covers a compact rectangle in (a, b) space; parquet footer min/max on
    both columns enable file skipping for point/range filters on either."""
    keyed = df.withColumn("__z", zorder_key(a, b, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
