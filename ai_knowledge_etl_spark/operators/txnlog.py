"""Minimal transaction-log table format (the public Delta/Iceberg core
idea, built from nothing but parquet + JSON files): a table is a directory
of immutable data files plus an append-only `_log/` of versioned commits,
each a JSON-lines file of add/remove actions. Readers replay the log to a
version to get the live file set — which gives snapshot isolation, TIME
TRAVEL, and compaction-without-downtime on any object store.

Commit protocol: data files are written first (invisible until
referenced), then the version file is published via write-temp + atomic
hard-link — `os.link(tmp, final)` fails with FileExistsError if `final`
exists, so of two racing writers exactly one claims version N and the
loser gets a clean conflict to retry at N+1. (A bare os.rename would be
wrong here: POSIX rename silently REPLACES an existing destination, so
an exists()-then-rename sequence is a TOCTOU lost-update.) A reader
never observes a half-commit because the link only appears complete.
This is the same optimistic-concurrency story Delta's _delta_log uses
(put-if-absent on the version object).

Scale notes: replay cost is O(actions), not O(table bytes) — at 100 TB
with daily compaction the log stays in the thousands of actions, and the
standard fix past that is checkpoint snapshots of the action set (a
parquet file every N versions), which this layout admits without change.
The file-set difference between versions is exactly the incremental-scan
contract (what scan-cdc-diff consumes).
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import DataFrame, SparkSession


def _log_dir(table: str) -> str:
    return os.path.join(table, "_log")


def _data_files(subdir: str) -> list[str]:
    return sorted(
        os.path.join(subdir, f)
        for f in os.listdir(subdir)
        if f.startswith("part-") and f.endswith(".parquet")
    )


def commit(table: str, version: int, adds: list[str], removes: list[str],
           op: str) -> None:
    """Atomically publish a version: temp-write the action file, then
    hard-link it to the final name. os.link is atomic fail-if-exists, so
    two racing writers cannot both claim `version` — exactly one link
    succeeds and the loser raises FileExistsError (no TOCTOU window, unlike
    exists()-then-rename, where rename would silently replace the winner's
    commit). Caller retries at the next version on conflict."""
    os.makedirs(_log_dir(table), exist_ok=True)
    final = os.path.join(_log_dir(table), f"{version:05d}.json")
    # Unique temp name per writer (pid AND thread) so racing writers never
    # clobber each other's staging file either.
    tmp = f"{final}.{os.getpid()}.{threading.get_ident()}.tmp"
    with open(tmp, "w") as f:
        for p in removes:
            f.write(json.dumps({"remove": {"path": p}}) + "\n")
        for p in adds:
            f.write(json.dumps({"add": {"path": p}}) + "\n")
        f.write(json.dumps({"commit": {"version": version, "op": op}}) + "\n")
    try:
        os.link(tmp, final)  # atomic put-if-absent publish
    except FileExistsError:
        raise FileExistsError(f"version {version} already committed")
    finally:
        os.unlink(tmp)


def write_files(spark: SparkSession, df: DataFrame, table: str,
                name: str, n_files: int = 1) -> list[str]:
    """Write df as immutable data files under table/<name>; returns paths.
    Not yet visible — only a commit() referencing them publishes them."""
    subdir = os.path.join(table, name)
    df.repartition(n_files).write.mode("error").parquet(subdir)
    return _data_files(subdir)


def live_files(table: str, version: int | None = None) -> list[str]:
    """Replay the log up to `version` (inclusive; None = latest) to the
    live file set."""
    log = _log_dir(table)
    versions = sorted(
        int(f[:-5]) for f in os.listdir(log) if f.endswith(".json")
    )
    live: set[str] = set()
    for v in versions:
        if version is not None and v > version:
            break
        with open(os.path.join(log, f"{v:05d}.json")) as f:
            for line in f:
                action = json.loads(line)
                if "add" in action:
                    live.add(action["add"]["path"])
                elif "remove" in action:
                    live.discard(action["remove"]["path"])
    return sorted(live)


def snapshot(spark: SparkSession, table: str, version: int | None = None,
             schema: str | None = None) -> DataFrame:
    """Time-travel read: the table as of `version` (None = latest)."""
    files = live_files(table, version)
    if not files:
        assert schema is not None, "empty snapshot needs an explicit schema"
        return spark.createDataFrame([], schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*files)
