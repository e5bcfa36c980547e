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


def merge_agg_partials(
    partials: list[DataFrame],
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Self-maintainable aggregate refresh: merge pre-aggregated partial
    frames (a stored materialized aggregate + signed delta partials) with
    one unionByName + one hash re-agg summing every partial column.

    Counts and sums are associative, so refresh cost scales with
    |delta rows| + |groups| — the base table's raw rows are never
    rescanned. Retractions (deletes/corrections) enter as NEGATIVE-weight
    partials; callers drop groups whose count reaches zero. min/max are
    NOT self-maintainable under deletes — re-scan only the affected
    groups for those (docs/SCALE.md, incremental refresh)."""
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return out.groupBy(*keys).agg(
        *[F.sum(c).cast("long").alias(c) for c in sum_cols]
    )


def apply_mv_batch(
    mv_root: str,
    batch_df: DataFrame,
    batch_id: int,
    keys: list[str],
    sum_cols: list[str],
    partial_fn,
) -> None:
    """One foreachBatch step of versioned incremental view maintenance —
    the idempotent exactly-once recipe stream-incremental-mv runs, exposed
    as a function so replay safety is directly testable (round-5 verdict
    #5): `partial_fn(batch_df)` aggregates ONLY this batch's rows into a
    (keys + sum_cols) partial frame, which merges with the newest version
    STRICTLY BELOW batch_id, then writes v{batch_id}.

    A replayed batch (same batch_id, at-least-once delivery) re-reads only
    versions below itself — never its own earlier output — and overwrites
    its own version directory, so applying the same (batch_df, batch_id)
    twice, or after an earlier crash, converges to the same result: the
    at-least-once log becomes an exactly-once MV."""
    import os
    import shutil

    cur = partial_fn(batch_df)
    prev_dir = os.path.join(mv_root, f"v{batch_id - 1}")
    if not os.path.isdir(prev_dir):
        newest = max(
            (
                v
                for v in range(batch_id)
                if os.path.isdir(os.path.join(mv_root, f"v{v}"))
            ),
            default=-1,
        )
        prev_dir = os.path.join(mv_root, f"v{newest}")
    sess = batch_df.sparkSession
    if os.path.isdir(prev_dir):
        prev = sess.read.parquet(prev_dir)
        merged = merge_agg_partials([prev, cur], keys, sum_cols)
    else:
        merged = cur
    out = os.path.join(mv_root, f"v{batch_id}")
    if os.path.isdir(out):
        shutil.rmtree(out)
    merged.write.mode("overwrite").parquet(out)


def table_exists(spark: SparkSession, path: str) -> bool:
    """Explicit existence probe through the Hadoop FileSystem API (works
    for any scheme the cluster can read, not just local paths)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


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

    The bootstrap branch is taken ONLY on an explicit existence probe —
    never by swallowing a read failure. This sink is the foreachBatch
    exactly-once MERGE target: treating a transient FS error or corrupted
    footer as "no table yet" would dynamic-overwrite the touched buckets
    with batch-only rows, silently dropping every pre-existing key in
    them. A failed read-back/collect now propagates and the micro-batch
    retries (round-3 advisor finding).
    """
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).alias(
        "__bucket"
    )
    upd = updates.withColumn("__bucket", bucket)
    current = None
    if table_exists(spark, path):
        try:
            current = spark.read.parquet(path)
        except Exception as e:
            # ONE narrowly-defined exemption: a prior zero-row write leaves
            # a directory with _SUCCESS but no part files, which fails
            # schema inference — that is an empty table, not a damaged
            # one, so bootstrap continues. Everything else (corrupt
            # footers, transient FS errors) still propagates.
            if "UNABLE_TO_INFER_SCHEMA" not in str(e):
                raise
    if current is not None:
        touched = [r["__bucket"] for r in upd.select("__bucket").distinct().collect()]
        base = current.where(F.col("__bucket").isin(touched))
        # localCheckpoint: the write below overwrites files this plan reads;
        # truncating lineage materializes the merge first (read-then-
        # overwrite on one path is otherwise rejected/unsafe)
        merged = merge_latest(
            base, upd, key=key, rev_col=rev_col
        ).localCheckpoint()
    else:
        # bootstrap must still collapse duplicate keys WITHIN the first
        # batch (one row per key, highest rev) — an at-least-once source
        # can deliver a key twice in the very first micro-batch
        merged = merge_latest(upd.limit(0), upd, key=key, rev_col=rev_col)
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


# --- versioned upserts (manifest-based time travel on plain parquet) ------------
#
# upsert_parquet above is IN-PLACE (dynamic partition overwrite): simple,
# but old bucket files are replaced, so history is gone. The versioned
# variant below never rewrites a file: each upsert writes the merged
# TOUCHED buckets under a new v{N}/ directory and a JSON manifest maps
# every bucket to the version directory holding its current file — the
# same files-plus-manifest design Delta/Iceberg use, with a readable
# plain-parquet layout. Readers pin a manifest, so concurrent reads see
# a consistent snapshot while writers add versions; `vacuum` deletes
# version dirs no kept manifest references.

import json as _json
import os as _os


def _manifest_dir(path: str) -> str:
    return _os.path.join(path, "_manifests")


def _latest_version(path: str) -> int:
    md = _manifest_dir(path)
    if not _os.path.isdir(md):
        return 0
    vs = [
        int(f[1:-5])
        for f in _os.listdir(md)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(vs, default=0)


def _read_manifest(path: str, version: int) -> dict:
    with open(_os.path.join(_manifest_dir(path), f"v{version}.json")) as fh:
        return _json.load(fh)


def upsert_parquet_versioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str = "doc_id",
    rev_col: str = "rev",
    n_buckets: int = 16,
) -> int:
    """Append-only upsert: merge `updates` into the touched buckets,
    write them under v{N}/, publish manifest v{N}. Returns N. Untouched
    buckets keep their existing files — zero rewrite amplification, and
    every prior version stays readable until vacuumed."""
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).alias(
        "__bucket"
    )
    upd = updates.withColumn("__bucket", bucket)
    prev_v = _latest_version(path)
    new_v = prev_v + 1
    if prev_v == 0:
        merged = upd
        touched = list(range(n_buckets))
        bucket_map: dict[str, str] = {}
    else:
        manifest = _read_manifest(path, prev_v)
        bucket_map = dict(manifest["buckets"])
        touched = [
            int(r["__bucket"])
            for r in upd.select("__bucket").distinct().collect()
        ]
        current_dirs = [
            _os.path.join(path, bucket_map[str(b)], f"__bucket={b}")
            for b in touched
            if str(b) in bucket_map
        ]
        if current_dirs:
            # leaf dirs read directly (no basePath: the v{N}/ layer is not
            # a partition key); __bucket re-derives from the key
            base = spark.read.parquet(*current_dirs)
            base = base.withColumn(
                "__bucket",
                F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)),
            )
            merged = merge_latest(base, upd, key=key, rev_col=rev_col)
        else:
            merged = upd
    (
        merged.where(F.col("__bucket").isin([int(t) for t in touched]))
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(_os.path.join(path, f"v{new_v}"))
    )
    for b in touched:
        bucket_map[str(b)] = f"v{new_v}"
    _os.makedirs(_manifest_dir(path), exist_ok=True)
    with open(
        _os.path.join(_manifest_dir(path), f"v{new_v}.json"), "w"
    ) as fh:
        _json.dump({"version": new_v, "buckets": bucket_map}, fh)
    return new_v


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: the table exactly as of manifest `version`
    (default: latest). Partition pruning on __bucket still applies."""
    v = version if version is not None else _latest_version(path)
    manifest = _read_manifest(path, v)
    dirs = [
        _os.path.join(path, vdir, f"__bucket={b}")
        for b, vdir in sorted(manifest["buckets"].items(), key=lambda kv: int(kv[0]))
    ]
    return spark.read.parquet(*dirs)


def vacuum(path: str, keep_last: int = 2) -> list[str]:
    """Delete version directories not referenced by the last `keep_last`
    manifests (and drop the older manifests). Returns removed dirs."""
    import shutil

    latest = _latest_version(path)
    keep_versions = list(range(max(1, latest - keep_last + 1), latest + 1))
    referenced = set()
    for v in keep_versions:
        referenced.update(_read_manifest(path, v)["buckets"].values())
    removed = []
    for d in _os.listdir(path):
        if d.startswith("v") and d != "_manifests":
            if d not in referenced and _os.path.isdir(
                _os.path.join(path, d)
            ):
                shutil.rmtree(_os.path.join(path, d))
                removed.append(d)
    for f in _os.listdir(_manifest_dir(path)):
        v = int(f[1:-5])
        if v not in keep_versions:
            _os.remove(_os.path.join(_manifest_dir(path), f))
    return removed


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    key: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Change feed between two manifest versions (the Delta
    table_changes idiom): snapshot-read both versions and classify each
    key as insert/delete/update/unchanged. Consumers poll this instead
    of re-reading the table — downstream incremental jobs process only
    what changed between versions."""
    old = read_version(spark, path, from_version)
    new = read_version(spark, path, to_version)
    return cdc_diff(old, new, key=key, fp_col=fp_col)
