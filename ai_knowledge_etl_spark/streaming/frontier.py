"""Batch-iterative crawl frontier (reference: commands/extract.md:761-831,
crawler-coordinator.md:180-246).

Pregel-style driver loop over DataFrames: each wave expands the frontier
through the link-edge table, anti-joins the visited set, and stops on an
empty frontier, the depth cap, or the page budget — the reference's
`queue empty ∨ processed ≥ max_pages` stop conditions
(commands/extract.md:770, config/limits.yaml:101-104).

Scale notes (100 TB): per-wave state is two DataFrames (frontier, visited);
`localCheckpoint` truncates lineage so wave N+1 doesn't replay waves 1..N.
The visited anti-join shuffles on the id — at web scale partition both sides
by id once and reuse the partitioning across waves. The depth cap bounds the
loop; the page budget is enforced on the *accumulated* count, exactly like
the reference's session cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config
from ai_knowledge_etl_spark.session import eager_cut


def bfs_frontier(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = config.MAX_DEPTH,
    max_pages: int | None = None,
) -> DataFrame:
    """Min-depth BFS: `edges(src, dst)`, `seeds(doc_id)` → (doc_id, depth).

    Equivalent to the SQL recursive CTE
        WITH RECURSIVE bfs AS (seeds at 0 UNION step while depth < max)
        SELECT doc_id, min(depth) ...
    which is exactly how the DuckDB oracle checks it.
    """
    visited = seeds.select(
        F.col("doc_id"), F.lit(0).cast("int").alias("depth")
    ).localCheckpoint()
    frontier = visited
    depth = 0
    while depth < max_depth:
        nxt = (
            edges.join(frontier, edges.src == frontier.doc_id)
            .select(F.col("dst").alias("doc_id"))
            .distinct()
            .join(visited.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(depth + 1).cast("int").alias("depth"))
        )
        nxt = nxt.localCheckpoint()  # truncate lineage per wave
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
        depth += 1
        if max_pages is not None and visited.count() >= max_pages:
            break
    return visited


def streaming_bfs_frontier(
    spark,
    edges: DataFrame,
    seeds: DataFrame,
    workdir: str,
    max_depth: int = config.MAX_DEPTH,
) -> DataFrame:
    """Streaming-native frontier (SURVEY §1.4 / §2.J): the queue is a
    parquet directory watched by readStream; each micro-batch anti-joins the
    visited store, appends discoveries, and writes the next wave BACK into
    the queue — a self-feeding stream. `processAllAvailable()` blocks until
    the stream quiesces, i.e. the BFS fixpoint (same result as the batch
    loop and the recursive-CTE oracle; asserted in tests).

    State (visited) lives in a parquet store + checkpointed sink — the
    restartable-crawl shape: kill the query, restart, and the checkpoint +
    store resume the frontier.
    """
    import os

    queue_dir = os.path.join(workdir, "queue")
    visited_dir = os.path.join(workdir, "visited")
    ckpt_dir = os.path.join(workdir, "ckpt")
    os.makedirs(queue_dir, exist_ok=True)

    seeds.select(
        F.col("doc_id").cast("long"), F.lit(0).cast("int").alias("depth")
    ).write.mode("overwrite").parquet(queue_dir)

    edges = eager_cut(edges)

    def process(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        batch = batch.groupBy("doc_id").agg(F.min("depth").alias("depth"))
        # Explicit existence probe, not try/except: swallowing a transient
        # read error here would re-process every visited doc in the batch
        # (same failure class as the upsert_parquet advisor finding).
        from ai_knowledge_etl_spark.operators.incremental import table_exists

        if table_exists(sp, visited_dir):
            visited = sp.read.parquet(visited_dir)
            new = batch.join(
                visited.select("doc_id"), "doc_id", "left_anti"
            )
        else:  # first batch — store doesn't exist yet
            new = batch
        new = new.localCheckpoint()
        if new.isEmpty():
            return
        new.write.mode("append").parquet(visited_dir)
        nxt = (
            edges.join(
                new.where(F.col("depth") < max_depth), edges.src == F.col("doc_id")
            )
            .select(
                F.col("dst").alias("doc_id"),
                (F.col("depth") + 1).cast("int").alias("depth"),
            )
            .distinct()
        )
        nxt.write.mode("append").parquet(queue_dir)

    stream = spark.readStream.schema("doc_id long, depth int").parquet(queue_dir)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(visited_dir)
    return out.groupBy("doc_id").agg(F.min("depth").cast("int").alias("depth"))
