"""A/B harness for sample-importance-reweight plan shapes (round 11).

The r10 artifact flags the query at 2.86x its same-window duck twin with
no committed crossover evidence. Before buying evidence, try to cut real
cost: the current shape tokenizes the corpus TWICE (once for the weight
table, once for the scoring join), and each pass pays an md5+conv per
TOKEN OCCURRENCE. Candidate shapes, all bit-identical by integer-sum
associativity (verified against the registered oracle by difftest after
the winner lands):

  A current      — two explode passes, md5 per occurrence per pass.
  B vocab        — tokenize once per pass but hash once per DISTINCT
                   token: pass 1 aggregates the token stream to a
                   vocabulary-sized (tok, c_n, t_n) frame (map-side
                   combine on Zipf-hot tokens), md5 runs on the VOCAB
                   frame only, weights come from the 4096-bucket
                   rollup of that frame; pass 2 re-explodes and
                   broadcast-joins tok -> w_millinats (vocab-sized
                   broadcast) — no md5 at all in the scoring pass.
  C chkpt        — explode+md5 once, localCheckpoint the narrow
                   (id, is_target, bucket) frame, reuse it for both
                   the weight rollup and the scoring join.

Usage: python tools/bench_dsir_shapes.py [--sf DIR] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import curation as CU
from ai_knowledge_etl_spark.session import get_spark

N = CU.N_FEATURE_BUCKETS


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )


def shape_a(docs: DataFrame) -> DataFrame:
    return CU.importance_scores(docs, "lang = 'en'")


def _toks(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        "is_target",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).where(F.length("tok") > 0)


def shape_b(docs: DataFrame) -> DataFrame:
    docs = docs.withColumn("is_target", F.expr("lang = 'en'"))
    toks = _toks(docs)
    vocab = toks.groupBy("tok").agg(
        F.count("*").cast("long").alias("c_n"),
        F.sum(F.col("is_target").cast("bigint")).cast("long").alias("t_n"),
    )
    vb = vocab.select(
        "tok",
        "c_n",
        "t_n",
        (
            F.conv(F.substring(F.md5("tok"), 1, 3), 16, 10).cast("int") % N
        ).alias("bucket"),
    )
    c = vb.groupBy("bucket").agg(
        F.sum("c_n").cast("long").alias("bc"),
        F.sum("t_n").cast("long").alias("bt"),
    )
    joined = c.select(
        "bucket",
        "bc",
        "bt",
        F.sum("bc").over(Window.partitionBy()).cast("bigint").alias("c_tot"),
        F.sum("bt").over(Window.partitionBy()).cast("bigint").alias("t_tot"),
    )
    w = F.round(
        1_000_000.0
        * (
            F.log((F.col("bt") + 1.0) / (F.col("t_tot") + N))
            - F.log((F.col("bc") + 1.0) / (F.col("c_tot") + N))
        )
    ).cast("bigint")
    weights = joined.select("bucket", w.alias("w_millinats"))
    tokw = vb.join(F.broadcast(weights), "bucket").select("tok", "w_millinats")
    return (
        _toks(docs)
        .join(F.broadcast(tokw), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("w_millinats").alias("score_millinats"),
        )
    )


def shape_c(docs: DataFrame) -> DataFrame:
    docs = docs.withColumn("is_target", F.expr("lang = 'en'"))
    flagged = CU.hashed_unigram_buckets(
        docs, "doc_id", "text", keep=("is_target",)
    ).localCheckpoint()
    weights = CU.importance_weights(flagged)
    return (
        flagged.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("w_millinats").alias("score_millinats"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("dsir-ab", adaptive=False, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    docs = _docs(spark, args.sf)
    docs.count()
    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    shapes = {"A-current": shape_a, "B-vocab": shape_b, "C-chkpt": shape_c}
    # equality check first (order-insensitive full compare, sf is small)
    ref = None
    for name, fn in shapes.items():
        rows = sorted(
            (r["doc_id"], r["n_toks"], r["score_millinats"])
            for r in fn(docs).collect()
        )
        if ref is None:
            ref = rows
            print(f"# {name}: {len(rows)} rows (reference)")
        else:
            same = rows == ref
            print(f"# {name}: identical={same}")
            if not same:
                raise SystemExit(f"{name} DIVERGES — not a valid shape")
    for name, fn in shapes.items():
        walls = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"dsir {name}")
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        print(f"{name}: {walls} min={min(walls)}")
    spark.stop()


if __name__ == "__main__":
    main()
