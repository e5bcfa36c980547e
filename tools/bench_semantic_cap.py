"""SemDeDup cluster-cap evidence harness (docs/PERF.md, VERDICT r2 #2).

Synthesizes the SemDeDup worst case — a near-duplicate-heavy corpus whose
vectors all land in ONE cluster (a single centroid, i.e. a degenerate
coarse quantizer; near-dup-heavy corpora are precisely when you run
SemDeDup) — and measures the within-cluster pair stage with and without
`max_cluster_size`. Uncapped, the pair join fans out n²/2 cosine
evaluations; capped, the mega-cluster is excluded from pair generation
(all members kept, conservative) and the stage is O(n).

Run: python tools/bench_semantic_cap.py [n_vecs]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import curation as CU


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # all vectors share a direction up to a tiny id-dependent wobble in one
    # coordinate: one centroid → one cluster of size n_vecs, and most pairs
    # clear the 0.95 cosine threshold (the worst case for the pair stage)
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.array(
            F.lit(1.0),
            F.lit(2.0),
            F.lit(3.0),
            F.lit(4.0) + (F.col("id") % 17) / 1000.0,
        ).alias("embedding"),
    )
    cents = spark.range(1).select(
        F.col("id").alias("cent_id"),
        F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0), F.lit(4.0)).alias("ce"),
    )
    assigned = CU.nearest_centroid(vecs, cents).persist()
    assigned.count()
    for tag, cap in (("capped_1000", 1000), ("uncapped", None)):
        t0 = time.monotonic()
        out = CU.semantic_dedup(
            vecs, cents, assigned=assigned, max_cluster_size=cap
        )
        n_kept = out.where("kept").count()
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "config": tag,
                    "n_vecs": n_vecs,
                    "n_kept": n_kept,
                    "wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()


