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

from ai_knowledge_etl_spark.session import eager_cut


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

    Driver loop, distributed rounds, ONE Spark job per round (r9 verdict
    #1 — the previous shape ran 2 joins + a checkpoint job + a separate
    convergence-probe job per round, and at sf0.1 the per-job scheduling
    floor, not data volume, dominated its 2.5× wall). Three fusions:

    - SELF-LOOPS instead of a left-join-back: with (n, n) edges folded
      into the symmetrized edge list, new_label(b) = min over
      a ∈ N(b) ∪ {b} of label(a) — a single equi-join + groupBy-min
      replaces the old join + agg + left-join + least/coalesce repair.
    - Round 1 needs NO join at all: the initial labeling is
      label(n) = n, so min-label-of-neighbors is just
      e.groupBy(b).agg(min(a)) straight off the edge table.
    - The convergence probe rides the materializing action: labels only
      ever DECREASE, so the exact Σlabel (DECIMAL(38,0) — BIGINT would
      overflow near 2^63 / max_id rows, inside the 100 TB envelope for
      64-bit ids) strictly decreases until the fixpoint; comparing one
      scalar per round replaces the old boolean __chg column + extra
      probe job. The sum runs against a NON-eager localCheckpoint, so
      the same job both materializes+truncates round N's lineage and
      reads the scalar.

    Per-round cost is one shuffle of |E| label offers; rounds = cluster
    diameter + 1 (the +1 proves the fixpoint). Dup-pair graphs are
    near-cliques (diameter ~2), so the whole closure is ~3 jobs after
    edge prep. For adversarial long-chain graphs swap in large-star/
    small-star (Kiveris et al.) — same join primitives, O(log n) rounds.
    `max_iter` is a safety bound, hit only if diameter exceeds it.
    """
    sc = edges.sparkSession.sparkContext
    # Symmetrize + self-loops off BOTH endpoints in ONE pass: each raw
    # (a, b) edge explodes to {(a,b), (b,a), (a,a), (b,b)} — every node
    # (degree ≥ 1 by construction) offers its own label to itself, making
    # the per-round groupBy-min self-contained. The explode references the
    # upstream edge pipeline exactly ONCE, so the whole prep is a single
    # checkpoint job; the 4-branch union this replaced needed the raw
    # edges checkpointed FIRST (un-checkpointed, the corpus pair pipeline
    # re-ran per branch: 2.3-3.4 s vs ~1.1 s at sf0.1, r10), i.e. two
    # materializations and two jobs for the same distinct edge table
    # (r11 A/B: dedup-cluster-cc 1.94 → 1.75 s median, same rows).
    # One distinct shuffle covers dedup across all four orientations —
    # duplicate offers wouldn't change any groupBy-min, but they would
    # inflate |E| for every round's join.
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                    F.struct(F.col("a"), F.col("a").alias("b")),
                    F.struct(F.col("b").alias("a"), F.col("b").alias("b")),
                )
            ).alias("e")
        )
        .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
        .distinct()
    )
    # eager_cut (default localCheckpoint), NOT bare persist: persist
    # caches row data but the logical plan of round N still nests rounds
    # 0..N-1, so Catalyst re-analyzes a quadratically growing plan every
    # iteration (measured: a 10-round chain graph goes from
    # minutes-to-hung to sub-second per round). Checkpointing truncates
    # lineage so every round plans against a flat scan. On a
    # multi-executor cluster set SPARK_GRAFT_EAGER_CUT=reliable (+
    # setCheckpointDir) for fault tolerance; the loop's own label
    # checkpoints below stay localCheckpoint(eager=False) — they are the
    # per-round truncation machinery with explicit RDD release.
    e = eager_cut(e)
    # round 1, join-free; Σnode and Σlabel in the SAME materializing
    # action: Σnode is exactly what Σlabel would read over the implicit
    # label(n) = n init, so round 1's convergence check costs nothing.
    labels = e.groupBy(F.col("b").alias("node")).agg(
        F.min("a").alias("label")
    ).localCheckpoint(eager=False)
    labels_ids = {_checkpointed_rdd_id(labels)}
    sums = labels.agg(
        F.sum(F.col("node").cast("decimal(38,0)")).alias("s0"),
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s1"),
    ).first()
    prev_sum, cur_sum = sums[0], sums[1]
    for _ in range(max_iter - 1):
        if cur_sum == prev_sum:  # fixpoint (also the empty-edges case)
            break
        prev_sum = cur_sum
        new_labels = (
            e.join(labels, e["a"] == labels["node"])
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        new_ids = {_checkpointed_rdd_id(new_labels)}
        # the one job of the round: materializes + lineage-truncates the
        # new label table AND reads the convergence scalar off it
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]
        labels = new_labels
        # round N is materialized; round N-1's checkpointed copy is dead
        _release_rdds(sc, labels_ids)
        labels_ids = new_ids
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
