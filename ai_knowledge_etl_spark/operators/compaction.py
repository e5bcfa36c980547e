"""Small-file compaction for parquet tables (lakehouse maintenance;
reference roadmap DESIGN.md:1693-1694 incremental processing implies
accumulating small update files — this is the OPTIMIZE step that keeps
scans healthy).

Why it matters at 100 TB: scan parallelism and parquet footer overhead
are governed by file count and size distribution; thousands of KB-sized
update files turn a columnar scan into a metadata storm. Compaction
bin-packs files toward a target size and rewrites only undersized ones.

Spark-first: the planning pass works on the FILE LISTING (one metadata
scan, driver-side — file counts are ~10^6 at 100 TB, trivially held),
then one distributed read of just the undersized files coalesced into
ceil(bytes/target) output files. Healthy files are never rewritten, so
compaction IO is proportional to the small-file backlog, not the table.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def plan_compaction(
    path: str, target_bytes: int = 128 * 1024 * 1024
) -> tuple[list[str], int]:
    """File-listing pass: returns (undersized files, n_output_files).
    A file already >= target/2 is left alone (rewriting it would churn
    IO for marginal layout gain — the same threshold Delta OPTIMIZE
    uses conceptually)."""
    small = []
    small_bytes = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(root, f)
            sz = os.path.getsize(full)
            if sz < target_bytes // 2:
                small.append(full)
                small_bytes += sz
    n_out = max(1, math.ceil(small_bytes / target_bytes)) if small else 0
    return small, n_out


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite the undersized files of `path` into ~target-sized files at
    `out_path` (healthy files are listed as `kept`, to be moved/linked by
    the table-format layer). Returns a stats dict for observability."""
    small, n_out = plan_compaction(path, target_bytes)
    if not small:
        return {"compacted_files": 0, "output_files": 0, "kept": 0}
    df = spark.read.parquet(*small)
    df.coalesce(n_out).write.mode("overwrite").parquet(out_path)
    kept = sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
        and os.path.join(root, f) not in set(small)
    )
    return {
        "compacted_files": len(small),
        "output_files": n_out,
        "kept": kept,
    }
