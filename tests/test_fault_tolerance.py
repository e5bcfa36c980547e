"""Fault-injection idempotence proofs (round-5 verdict #5): the two
operational properties a 100 TB job actually depends on, demonstrated
rather than asserted in prose.

1. TASK RETRY: Spark re-runs a failed task attempt on the same input
   split. A deterministic Arrow kernel therefore produces the identical
   result whether or not an attempt died first — proven by making a real
   repo kernel (operators/chunking.chunk_document via mapInPandas) raise
   on every FIRST attempt (TaskContext.attemptNumber() == 0) under
   spark.task.maxFailures=2 and diffing against the clean run. Runs in a
   subprocess because maxFailures is baked into the local master string
   (local[4, 2]) and the session-scoped test JVM is local[N] (= 1, no
   retries).

2. AT-LEAST-ONCE REPLAY: foreachBatch can deliver a batch twice (crash
   after side effect, before checkpoint commit). stream-incremental-mv's
   versioned-directory recipe (operators/incremental.apply_mv_batch) must
   converge to the same MV when a (batch_df, batch_id) pair is applied
   twice — the replay reads only versions strictly below itself and
   overwrites its own.

Reference anchor: retry-backoff + never-silently-fail
(agents/extractor.md:694-747).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RETRY_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "@@REPO@@")
    from pyspark.sql import SparkSession
    from pyspark import TaskContext
    import pandas as pd

    from ai_knowledge_etl_spark.operators.chunking import chunk_document

    spark = (
        SparkSession.builder.master("local[4, 2]")  # 2 = task maxFailures
        .appName("fault-injection")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )
    ensure_package_on_workers(spark)  # addPyFile: workers don't share cwd
    docs = (
        spark.read.parquet("@@SF_DIR@@" + "/documents.parquet")
        .select("doc_id", "text")
        .repartition(4)
    )
    schema = "doc_id long, chunk_idx int, n_chars long"

    def kernel(fail_first):
        def gen(batches):
            tc = TaskContext.get()
            if fail_first and tc is not None and tc.attemptNumber() == 0:
                raise RuntimeError(
                    "injected: first attempt of partition %d dies"
                    % tc.partitionId()
                )
            for pdf in batches:
                ids, idxs, lens = [], [], []
                for did, txt in zip(pdf["doc_id"], pdf["text"]):
                    for i, ch in enumerate(chunk_document(txt or "")):
                        ids.append(did); idxs.append(i); lens.append(len(ch))
                yield pd.DataFrame(
                    {"doc_id": ids, "chunk_idx": idxs, "n_chars": lens}
                )
        return gen

    def run(fail_first):
        return sorted(
            map(tuple, docs.mapInPandas(kernel(fail_first), schema).collect())
        )

    clean = run(False)
    faulty = run(True)  # EVERY task's first attempt dies, retry succeeds
    assert len(clean) > 0, "kernel produced no rows"
    assert faulty == clean, "retry changed the result"
    print("RETRY-IDEMPOTENT", len(clean))
    spark.stop()
    """
)


def test_task_retry_preserves_arrow_kernel_result(sf_dir):
    """Every task's first attempt raises; maxFailures=2 retries it; the
    output must be byte-equal to the clean run."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _RETRY_SCRIPT.replace("@@REPO@@", REPO).replace(
                "@@SF_DIR@@", sf_dir
            ),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/tmp",  # driver-contract discipline: never rely on repo cwd
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY-IDEMPOTENT" in proc.stdout, proc.stdout


def test_foreachbatch_duplicate_batch_replay_is_idempotent(
    spark, sf_dir, tmp_path
):
    """Apply batches 0,1 — then REPLAY batch 1 with the same rows (the
    at-least-once scenario: sink side effect committed, checkpoint not).
    The MV at v1 must be identical before and after the replay, and must
    equal the batch groupBy truth over all delivered rows."""
    from ai_knowledge_etl_spark.operators.incremental import apply_mv_batch
    from ai_knowledge_etl_spark.registry.streaming import (
        _user_stats_partials,
    )

    mv_root = str(tmp_path / "mv")
    os.makedirs(mv_root)
    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    b0 = ev.where("event_id % 2 = 0")
    b1 = ev.where("event_id % 2 = 1")

    def apply(df, bid):
        apply_mv_batch(
            mv_root, df, bid, ["user_id"],
            ["n_events", "total_cents"], _user_stats_partials,
        )

    apply(b0, 0)
    apply(b1, 1)
    want = sorted(
        map(tuple, spark.read.parquet(os.path.join(mv_root, "v1")).collect())
    )
    # duplicate delivery of batch 1 (same id, same rows)
    apply(b1, 1)
    got = sorted(
        map(tuple, spark.read.parquet(os.path.join(mv_root, "v1")).collect())
    )
    assert got == want
    truth = sorted(
        map(tuple, _user_stats_partials(ev).collect())
    )
    assert got == truth
    # and a replay arriving AFTER a later version exists must still not
    # double-count: v2 from batch 2, then batch 1 replays — v1 rebuilt
    # from v0 only, identical again
    b2 = ev.limit(0)
    apply(b2, 2)
    apply(b1, 1)
    got2 = sorted(
        map(tuple, spark.read.parquet(os.path.join(mv_root, "v1")).collect())
    )
    assert got2 == want
