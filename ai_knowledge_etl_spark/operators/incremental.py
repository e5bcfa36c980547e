"""Incremental processing + cache semantics (reference roadmap:
DESIGN.md:1664 cache config `ttl: 3600`, DESIGN.md:1693-1694 "cache
mechanism / incremental processing" — future support there; first-class
here).

Spark-first design, no Delta/iceberg dependency:

- `merge_latest` is the MERGE core: newest revision per key wins. It is a
  pure DataFrame transform (union + per-key max-rev pick), so the
  correctness gate can diff it against a DuckDB oracle.
- `upsert_parquet` applies the merge to a parquet table *incrementally*:
  the table is laid out partitioned by a stable key bucket, and dynamic
  partition overwrite (`partitionOverwriteMode=dynamic`) rewrites ONLY the
  buckets that received updates. At 100 TB with 4096 buckets, an update
  batch touching 1% of keys rewrites ~1% of files; the rest are untouched
  (verified by file mtimes in tests/test_sinks_sources.py). This is the
  same pruning story Delta's OPTIMIZE-free MERGE relies on, expressed with
  nothing but parquet + partition layout.
- `ttl_cache_decisions` is the fetch-cache policy: latest fetch per URL,
  HIT while younger than the TTL, MISS (refetch) after — the reference's
  `cache.ttl: 3600` keyed by URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_latest(
    existing: DataFrame,
    updates: DataFrame,
    key: str = "doc_id",
    rev_col: str = "rev",
) -> DataFrame:
    """Upsert semantics: one row per key, the highest-revision row wins
    (updates beat existing at equal rev via a deterministic source rank)."""
    tagged = existing.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(
        F.desc(rev_col), F.desc("__src")
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str = "doc_id",
    rev_col: str = "rev",
    n_buckets: int = 16,
) -> None:
    """Incremental file-level merge into a bucket-partitioned parquet table.

    Reads back ONLY the buckets present in `updates` (partition pruning on
    the scan), merges, and dynamic-overwrites exactly those partition dirs.
    First call (no table yet) writes all buckets.
    """
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).alias(
        "__bucket"
    )
    upd = updates.withColumn("__bucket", bucket)
    try:
        current = spark.read.parquet(path)
        touched = [r["__bucket"] for r in upd.select("__bucket").distinct().collect()]
        base = current.where(F.col("__bucket").isin(touched))
        # localCheckpoint: the write below overwrites files this plan reads;
        # truncating lineage materializes the merge first (read-then-
        # overwrite on one path is otherwise rejected/unsafe)
        merged = merge_latest(
            base, upd, key=key, rev_col=rev_col
        ).localCheckpoint()
    except Exception:  # AnalysisException: path does not exist yet
        merged = upd
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("__bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def ttl_cache_decisions(
    fetch_log: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    now_col: str = "now_s",
    ttl_s: int = 3600,
) -> DataFrame:
    """Latest fetch per URL + HIT/MISS under a TTL, relative to a supplied
    `now` column (callers pass a deterministic clock; reference:
    DESIGN.md:1664 `cache: ttl: 3600`)."""
    w = Window.partitionBy(url_col).orderBy(F.desc(ts_col))
    latest = (
        fetch_log.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    age = F.col(now_col) - F.col(ts_col)
    return latest.select(
        F.col(url_col),
        F.col(ts_col).alias("last_fetch_s"),
        age.cast("bigint").alias("age_s"),
        (age < ttl_s).alias("cache_hit"),
    )


def cdc_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Change-data-capture diff between two table versions: full outer
    join on the key, classify each key as insert / delete / update /
    unchanged by fingerprint. One shuffle on the key (co-partitioned at
    scale when both versions are bucketed by the key, in which case the
    join is shuffle-free); the action column feeds incremental consumers
    the same way a Delta change feed would."""
    o = old.select(F.col(key).alias("__k"), F.col(fp_col).alias("__old_fp"))
    n = new.select(F.col(key).alias("__nk"), F.col(fp_col).alias("__new_fp"))
    j = o.join(n, o["__k"] == n["__nk"], "full_outer")
    action = (
        F.when(F.col("__k").isNull(), "insert")
        .when(F.col("__nk").isNull(), "delete")
        .when(F.col("__old_fp") != F.col("__new_fp"), "update")
        .otherwise("unchanged")
    )
    return j.select(
        F.coalesce("__k", "__nk").alias(key),
        action.alias("action"),
        F.col("__old_fp").alias("old_fp"),
        F.col("__new_fp").alias("new_fp"),
    )
