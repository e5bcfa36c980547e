"""Iterative graph ranking over the crawl link graph (SURVEY §2.D/§2.J
extension — the reference keeps a links/*.json edge table and scores
pages heuristically; PageRank is the principled version of that signal).

Spark-first: each PageRank iteration is two equi-joins (edges × ranks,
edges × out-degrees) and one groupBy-sum — the same shuffle geometry as
any star join, linear in |E|, no driver-side graph. Contribution sums
run in DECIMAL(28,18) so the reduction is exact and order-independent:
the differential oracle then needs NO float tolerance even though both
engines shuffle in different orders. A fixed iteration count keeps the
computation a finite, oracle-expressible SQL pipeline; convergence-
looped variants reuse the same body (cf. operators/clustering.py's
fixpoint loop for the pattern).

Dangling nodes (no out-links) drop their mass rather than redistribute
it — the simplification is applied identically in the Spark and oracle
formulations, so parity still verifies the join/agg machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TELEPORT = 0.15
DAMPING = 0.85


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    n_iter: int = 2,
) -> DataFrame:
    """`nodes(node)`, `edges(src, dst)` -> (node, pr) after `n_iter`
    power iterations with 0.15/N teleport. `n_nodes` is passed in (a
    driver-side count) so the plan stays a pure pipeline."""
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(n_iter):
        contrib = (
            edges.join(pr, edges["src"] == pr["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node2"),
                (F.col("pr") / F.col("d")).cast("decimal(28,18)").alias("c"),
            )
        )
        incoming = contrib.groupBy("node2").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(incoming, nodes["node"] == incoming["node2"], "left")
            .select(
                "node",
                (
                    F.lit(TELEPORT / n_nodes)
                    + F.lit(DAMPING)
                    * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                ).alias("pr"),
            )
        )
    return pr
