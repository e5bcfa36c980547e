"""Per-stage profile of pipeline-training-set (round-12, VERDICT r11 #2).

The pipeline's fresh-JVM floor has sat at ~4.5 s since r10 while its
stages were individually optimized — this tool decomposes the composed
plan at the stage seams (the warc-corpus discipline, r7) so the flat
floor is attributable: each stage is materialized through the noop sink
in dependency order, timed same-session, min-of-N.

Usage: python tools/bench_training_stages.py [--sf DIR] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F, Window  # noqa: E402

from ai_knowledge_etl_spark import config  # noqa: E402
from ai_knowledge_etl_spark.functions import text as TX  # noqa: E402
from ai_knowledge_etl_spark.operators import (  # noqa: E402
    clustering,
    dedup,
    packing,
    sampling,
)
from ai_knowledge_etl_spark.session import get_spark  # noqa: E402


def t(df, label, n):
    walls = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    print(f"{label:28s} min {min(walls):7.3f}  walls {walls}")
    return min(walls)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("train-stages", adaptive=False, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from ai_knowledge_etl_spark.registry import REGISTRY
    from ai_knowledge_etl_spark.registry.northstar import _dup_corpus
    from ai_knowledge_etl_spark.registry.training import _PII_TAIL_SQL

    # whole query first (the reference wall)
    t(REGISTRY["pipeline-training-set"].spark(spark, args.sf), "WHOLE", args.n)

    corpus = _dup_corpus(spark, args.sf).select(
        "doc_id", "source", F.expr(f"text || {_PII_TAIL_SQL}").alias("text")
    )
    clean = corpus.where(
        F.col("text").isNotNull() & (F.length("text") >= 120)
    ).withColumn("text", TX.redact_pii("text"))
    t(clean, "clean (redact)", args.n)

    fps = clean.select("doc_id", dedup.fingerprint("text").alias("fp"))
    t(fps, "fps", args.n)

    wfp = Window.partitionBy("fp")
    exact_e = (
        fps.withColumn("a", F.min("doc_id").over(wfp))
        .where(F.col("a") != F.col("doc_id"))
        .select("a", F.col("doc_id").alias("b"))
    )
    reps = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    t(exact_e, "exact_e", args.n)

    sh = dedup.shingles(
        clean.join(reps, "doc_id", "left_semi"),
        "doc_id", "text", n=3, keep=("source",),
    )
    shc = dedup.cap_shingle_df(sh, "doc_id", config.DEDUP_SHINGLE_MAX_DF, "source")
    t(shc, "shingles+cap", args.n)

    jac = dedup.jaccard_pairs(shc, "doc_id", "source", threshold=0.6).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    t(jac, "jaccard_pairs", args.n)

    clusters = clustering.canonical_clusters(exact_e.unionByName(jac))
    t(clusters, "canonical_clusters", args.n)

    drop = clusters.where(~F.col("is_canonical")).select("doc_id")
    kept = clean.join(drop, "doc_id", "left_anti")
    split = sampling.train_val_test(kept, "doc_id")
    t(split, "kept+split", args.n)

    with_tok = split.withColumn(
        "n_tok", F.size(F.split("text", " ")).cast("long")
    ).withColumn("stream", F.concat_ws("/", "split", "source"))
    packed = packing.concat_chunk_pack(
        with_tok, order_col="doc_id", tok_col="n_tok",
        budget=512, partition_col="stream",
    ).drop("stream")
    final = packed.select(
        "doc_id", "source", "split", "n_tok", "cum_prev",
        "first_window", "last_window", "n_windows",
        F.md5("text").alias("red_fp"),
    )
    t(final, "FULL (rebuilt)", args.n)


if __name__ == "__main__":
    main()
