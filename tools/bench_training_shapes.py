"""A/B probe for pipeline-training-set shapes (round-12, VERDICT r11 #2).

Shape A (current): `clean` (corpus synth + PII concat + redact chain)
is recomputed under THREE consumers (fps, the shingle stage, kept), and
`fps` under two (exact-star window + reps groupBy).

Shape B (candidate): eager-checkpoint `clean` once; ONE window pass
annotates every doc with its exact-group min id (narrow (id, a) frame,
checkpointed) from which both the star edges (a != id) and the reps
(a == id) project — value-identical by construction (min per fp group).

Timing matches bench methodology: construction + noop in the timed
region (the CC loop's eager checkpoints run at construction). Interleaved
A,B,A,B,... min/median-of-N; full-result equality checked first.

Usage: python tools/bench_training_shapes.py [--sf DIR] [--n 5]
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


def build(spark, sf_dir, shape: str):
    from ai_knowledge_etl_spark.registry.northstar import _dup_corpus
    from ai_knowledge_etl_spark.registry.training import _PII_TAIL_SQL

    corpus = _dup_corpus(spark, sf_dir).select(
        "doc_id", "source", F.expr(f"text || {_PII_TAIL_SQL}").alias("text")
    )
    clean = corpus.where(
        F.col("text").isNotNull() & (F.length("text") >= 120)
    ).withColumn("text", TX.redact_pii("text"))
    if shape == "B":
        clean = clean.localCheckpoint()

    fps = clean.select("doc_id", dedup.fingerprint("text").alias("fp"))
    if shape == "A":
        wfp = Window.partitionBy("fp")
        exact_e = (
            fps.withColumn("a", F.min("doc_id").over(wfp))
            .where(F.col("a") != F.col("doc_id"))
            .select("a", F.col("doc_id").alias("b"))
        )
        reps = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select(
            "doc_id"
        )
    else:
        anno = (
            fps.select(
                "doc_id",
                F.min("doc_id").over(Window.partitionBy("fp")).alias("a"),
            )
            .localCheckpoint()
        )
        exact_e = anno.where(F.col("a") != F.col("doc_id")).select(
            "a", F.col("doc_id").alias("b")
        )
        reps = anno.where(F.col("a") == F.col("doc_id")).select("doc_id")

    sh = dedup.shingles(
        clean.join(reps, "doc_id", "left_semi"),
        "doc_id", "text", n=3, keep=("source",),
    )
    sh = dedup.cap_shingle_df(sh, "doc_id", config.DEDUP_SHINGLE_MAX_DF, "source")
    jac = dedup.jaccard_pairs(sh, "doc_id", "source", threshold=0.6).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    clusters = clustering.canonical_clusters(exact_e.unionByName(jac))
    drop = clusters.where(~F.col("is_canonical")).select("doc_id")
    kept = clean.join(drop, "doc_id", "left_anti")
    split = sampling.train_val_test(kept, "doc_id")
    with_tok = split.withColumn(
        "n_tok", F.size(F.split("text", " ")).cast("long")
    ).withColumn("stream", F.concat_ws("/", "split", "source"))
    packed = packing.concat_chunk_pack(
        with_tok, order_col="doc_id", tok_col="n_tok",
        budget=512, partition_col="stream",
    ).drop("stream")
    return packed.select(
        "doc_id", "source", "split", "n_tok", "cum_prev",
        "first_window", "last_window", "n_windows",
        F.md5("text").alias("red_fp"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("train-shapes", adaptive=False, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # equality first
    ra = sorted(map(tuple, build(spark, args.sf, "A").collect()))
    rb = sorted(map(tuple, build(spark, args.sf, "B").collect()))
    print(f"equality: {'PASS' if ra == rb else 'FAIL'} ({len(ra)} rows)")
    if ra != rb:
        sys.exit(1)

    walls = {"A": [], "B": []}
    for _ in range(args.n):
        for shape in ("A", "B"):
            t0 = time.time()
            build(spark, args.sf, shape).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[shape].append(round(time.time() - t0, 3))
    for shape in ("A", "B"):
        w = sorted(walls[shape])
        print(
            f"{shape}: min {w[0]:.3f} med {w[len(w) // 2]:.3f} walls {walls[shape]}"
        )


if __name__ == "__main__":
    main()
