"""Connected components for dedup clustering (SURVEY §2.I north-star).

Near-dup detection emits PAIRS (exact-fingerprint groups, Jaccard/MinHash
edges); a real pipeline must then pick ONE canonical document per
transitive cluster — A~B and B~C must collapse A,B,C together even when
A~C was never scored. That closure is connected components over the
pair graph.

Spark-first design: iterative min-label propagation as pure DataFrame
ops — each round is one equi-join (edges × labels) + one groupBy-min,
i.e. two shuffles on the node key, no driver-side graph. Rounds needed =
cluster diameter, which for dup clusters is tiny (pairs come from shared
content, so clusters are near-cliques). The loop stops at an exact
fixpoint via a per-round changed-count. At 100 TB the same loop holds
because per-round cost is |E| shuffle bytes and diameter stays O(1) for
dup graphs; for adversarial long-chain graphs swap in the large-star/
small-star rounds of Kiveris et al. "Connected Components in MapReduce"
(same join primitives, O(log n) rounds) — not needed for dedup.

Reference behavior: the reference dedups by exact content hash only
(crawler-queue.sh:36-41 at-most-once visits); transitive near-dup
clustering is the training-data-pipeline extension this repo adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _checkpointed_rdd_id(df: DataFrame) -> int | None:
    """Id of the RDD an EAGER localCheckpoint pinned for `df`.

    Read directly off the DataFrame's analyzed plan (a LogicalRDD wrapping
    the checkpointed RDD) — NEVER by diffing sc.getPersistentRDDs() before
    and after: under concurrent queries that diff claims other threads'
    freshly checkpointed RDDs, and releasing those kills the running query
    with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (seen in the round-3 concurrent
    bench)."""
    try:
        return df._jdf.queryExecution().analyzed().rdd().id()
    except Exception:  # not a LogicalRDD-backed frame — nothing pinned
        return None


def _release_rdds(sc, rdd_ids: set[int | None]) -> None:
    """Unpersist the given checkpointed RDDs if still pinned. localCheckpoint
    pins its materialized RDD in storage until GC; an iterative loop must
    release round N-1's copy explicitly or up to max_iter label tables stay
    resident (ADVICE r1)."""
    jmap = dict(sc._jsc.getPersistentRDDs())
    for rid in rdd_ids:
        jrdd = jmap.get(rid) if rid is not None else None
        if jrdd is not None:
            jrdd.unpersist(False)


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through `edges` (undirected) with the
    min node id of its component. Returns (node, cluster_id).

    Driver loop, distributed rounds: iterate until no label changes
    (checked with a 1-row count action per round); `max_iter` is a
    safety bound, hit only if diameter exceeds it.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        # localCheckpoint, NOT persist: persist caches row data but the
        # logical plan of round N still nests rounds 0..N-1, so Catalyst
        # re-analyzes a quadratically growing plan every iteration (measured:
        # a 10-round chain graph goes from minutes-to-hung to sub-second per
        # round). Checkpointing truncates lineage so every round plans
        # against a flat scan. On a multi-executor cluster prefer
        # spark.sparkContext.setCheckpointDir + .checkpoint() for fault
        # tolerance; local mode has no executor loss to survive.
        .localCheckpoint()
    )
    sc = edges.sparkSession.sparkContext
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    labels_ids = {_checkpointed_rdd_id(labels)}
    for _ in range(max_iter):
        # each node offers its label to every neighbor; take the min offer
        offers = (
            e.join(labels, e["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(offers, labels["node"] == offers["node2"], "left")
            .select(
                "node",
                F.least(
                    "label", F.coalesce("nbr_label", "label")
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("__chg"),
            )
            # eager: materializes every partition exactly once AND truncates
            # lineage, so the convergence probe below reads checkpointed rows
            .localCheckpoint()
        )
        new_ids = {_checkpointed_rdd_id(new_labels)}
        changed = new_labels.agg(
            F.max(F.coalesce("__chg", F.lit(False)))
        ).first()[0]
        labels = new_labels.drop("__chg")
        # round N is materialized; round N-1's checkpointed copy is dead
        _release_rdds(sc, labels_ids)
        labels_ids = new_ids
        if not changed:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def canonical_clusters(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Cluster assignment + canonical flag + cluster size for every node
    that participates in at least one dup edge. cluster_id = min node id
    of the component (the doc a pipeline keeps); everything else in the
    cluster is dropped as a duplicate."""
    cc = connected_components(edges, src=src, dst=dst)
    w = Window.partitionBy("cluster_id")
    return cc.select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("node").cast("long").alias("doc_id"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
        F.count("*").over(w).cast("long").alias("n_members"),
    )
