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

try:  # Spark >= 4.0, and protobuf present (the TWS state protocol needs
    # google.protobuf in every python worker; without it the driver-side
    # pre-init worker crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION).
    # Version floor: Spark 4.1's StateMessage_pb2 gencode imports
    # google.protobuf.runtime_version, added in protobuf 5.27 — an older
    # 4.x runtime gets past this import but fails inside the streaming
    # runner (verified in-sandbox against a vendored 4.23: the RocksDB
    # provider and runner wiring all work; only the protobuf import line
    # fails). On a real cluster: `--py-files` the package and ship
    # protobuf>=5.27 in the environment; no code changes needed.
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark or no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]
    HAS_TWS = False

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
_STATE_SCHEMA = "n BIGINT, total DOUBLE"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class UserStatsProcessor(StatefulProcessor):
    """Running per-user (count, value-sum) with a single typed ValueState.

    Emits the post-update running totals once per key per micro-batch, so
    under outputMode=update the latest row per key is the final answer.
    """

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._stats = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        prev = self._stats.get()
        n = int(prev[0]) if prev is not None else 0
        total = float(prev[1]) if prev is not None else 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._stats.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


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
