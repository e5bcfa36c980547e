"""Custom stateful streaming operators via transformWithStateInPandas
(SURVEY §2.J) — the Spark 4.x StatefulProcessor API, successor to
applyInPandasWithState (which streaming/frontier.py and the visited-state
tests use).

Why both APIs exist here: applyInPandasWithState is the stable workhorse;
transformWithState adds composable typed state (multiple named ValueState/
ListState/MapState per key), timers, and TTL — the natural home for the
reference's per-host crawl bookkeeping (visited set + budget + backoff
clock per domain, reference: DESIGN.md crawl loop). At scale the state
lives in the RocksDB state store, partitioned by grouping key across
executors; nothing is ever collected to the driver.

Batch twin with a DuckDB oracle: registry/streaming.py
`stream-user-stats-tws` (a plain groupBy — the streaming run must converge
to exactly that, which tests/test_streaming.py asserts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ai_knowledge_etl_spark.compat import ensure_protobuf

try:  # Spark >= 4.0, and protobuf present (the TWS state protocol needs
    # google.protobuf in the driver, the pre-init streaming runner, AND
    # every python worker; without it the pre-init worker crashes with
    # STREAMING_PYTHON_RUNNER_INITIALIZATION). Version floor: Spark 4.1's
    # StateMessage_pb2 gencode imports google.protobuf.runtime_version,
    # added in protobuf 5.27. compat.ensure_protobuf() resolves this in
    # the no-network container from the on-disk pure-Python protobuf 6.32
    # (and exports PYTHONPATH for the runner/workers — effective when the
    # session comes from session.get_spark, which calls it pre-JVM). On a
    # real cluster: ship protobuf>=5.27 in the env; the shim is a no-op.
    if not ensure_protobuf():  # pragma: no cover - no protobuf anywhere
        raise ImportError("google.protobuf unavailable")
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark or no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]
    HAS_TWS = False

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_cents BIGINT"
_STATE_SCHEMA = "n BIGINT, cents BIGINT"

# re-export: config owns the single source of truth (the "cluster"
# state-store profile builds its conf from the same constant)
from ai_knowledge_etl_spark.config import ROCKSDB_PROVIDER  # noqa: E402,F401


class UserStatsProcessor(StatefulProcessor):
    """Running per-user (count, cents-sum) with a single typed ValueState.

    Emits the post-update running totals once per key per micro-batch, so
    under outputMode=update the latest row per key is the final answer.

    The accumulator is EXACT integer cents (the input stream carries a
    pre-rounded BIGINT `cents` column), matching the repo convention set
    by stream-incremental-mv: a double accumulator's value would depend
    on arrival order (FP association), which can flip a 2-decimal display
    rounding near .005 boundaries and make the batch differential flaky —
    integer sums are associative, so the streaming result is
    arrival-order- and partitioning-invariant by construction.
    """

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._stats = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        prev = self._stats.get()
        n = int(prev[0]) if prev is not None else 0
        cents = int(prev[1]) if prev is not None else 0
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
        self._stats.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
            }
        )

    def close(self) -> None:
        pass


def prepare_session(spark) -> None:
    """Make transformWithState runnable on a session created by ANYONE
    (the external driver builds its own SparkSession, so the pre-JVM env
    export in session.get_spark may not have happened). The TWS PRE-INIT
    runner is spawned by the JVM from the PythonFunction's envVars — which
    come from sparkContext.environment, mutable at runtime — and it does
    NOT see addPyFile includes (verified: a py-files-shipped package is
    ModuleNotFound there while regular task workers import it fine). So
    this sets PYTHONPATH (repo root + the protobuf fallback dir) and the
    protobuf version-check override in sc.environment. Idempotent, cheap,
    a no-op for everything except TWS queries."""
    import os
    import sys as _sys

    import ai_knowledge_etl_spark as _pkg

    ensure_protobuf()  # driver-side import + os.environ export
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))
    # Same never-shadow ordering as compat.ensure_protobuf: repo root first,
    # the inherited PYTHONPATH next, and the protobuf fallback dirs LAST —
    # the App Engine platform dir ships other top-level packages that must
    # never shadow a real install in the TWS pre-init runner.
    parts = [repo_root]
    prev = os.environ.get("PYTHONPATH", "")
    if prev:
        parts.append(prev)
    for p in _sys.path:
        if os.path.isdir(os.path.join(p, "google", "protobuf")):
            parts.append(p)
    env = spark.sparkContext.environment
    env["PYTHONPATH"] = os.pathsep.join(dict.fromkeys(parts))
    check = os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK")
    if check:
        env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = check


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running stats over an events stream (needs the RocksDB
    state store provider — transformWithState does not support the default
    HDFS-backed provider)."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
