"""Deterministic sampling for training-data pipelines (SURVEY §2.I
extension).

`rand()` sampling is useless in a differential-tested, re-runnable
pipeline: re-executions (speculative tasks, stage retries, incremental
reruns) must pick the SAME rows. All sampling here keys off md5(id) —
stable across engines (the DuckDB oracle computes the identical sample),
across runs, and across partitionings. Rates are expressed as a 2-hex-char
threshold over the md5 prefix (k/256 resolution): `md5(id)[:2] < '80'`
is a 50% sample that every engine agrees on.

Scale: every operator here is a narrow map (filter on a hash of the
row's own key) or a bounded per-group top-k — no global shuffle, no
driver state. A 100 TB stratified sample is exactly as parallel as the
scan itself.

Reference: the reference has no sampling surface; this is part of the
training-data extension (hash-split train/val/test is the idiom its
downstream consumers need).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash2(key: Column) -> Column:
    """First two hex chars of md5(key-as-string): a uniform, engine-
    portable 256-bucket hash tag."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


def deterministic_sample(
    df: DataFrame, key_col: str, threshold_hex: str
) -> DataFrame:
    """Keep rows whose hash tag sorts below `threshold_hex` ('80' = 50%,
    '2a' = ~16%, '0d' = ~5%)."""
    return df.where(hash2(F.col(key_col)) < threshold_hex)


def stratified_sample(
    df: DataFrame, key_col: str, threshold: Column
) -> DataFrame:
    """Per-stratum rates: `threshold` is any expression yielding the
    2-hex-char cutoff for each row (CASE over the stratum column). Rows
    whose cutoff is None are kept whole."""
    tag = hash2(F.col(key_col))
    return df.where(threshold.isNull() | (tag < threshold))


def reservoir_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Deterministic 'reservoir': the k rows per group with the smallest
    hash tag (uniform over the group, stable across runs). Adds `rk`.
    One shuffle on the group key; per-group state is O(k) under Spark's
    window TopK optimization."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return df.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def train_val_test(
    df: DataFrame,
    key_col: str,
    train_hex: str = "cc",
    val_hex: str = "e6",
) -> DataFrame:
    """Hash-split assignment: [0, train_hex) -> train, [train_hex,
    val_hex) -> val, rest -> test (defaults ~80/10/10). Pure map — the
    split of a row never depends on the rest of the dataset, so it is
    stable under appends and reprocessing."""
    tag = hash2(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(tag < train_hex, "train")
        .when(tag < val_hex, "val")
        .otherwise("test"),
    )
