"""Hot-boilerplate paragraph-dedup harness: every doc shares the same
footer paragraph (the worst-case fingerprint), measuring the ranking-
window keep-first (one unsplittable partition owns every copy) against
the shipped min-struct aggregate (map-side partial combine).

Usage: python tools/bench_para_hot.py [--n 200000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import curation as CU
from ai_knowledge_etl_spark.session import get_spark


def window_variant(docs):
    """The oracle-twin formulation: row_number over the fingerprint."""
    paras = CU.split_paragraphs(docs)
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "idx")
    ranked = paras.withColumn("rn", F.row_number().over(w))
    return ranked.where("rn = 1")


def agg_variant(docs):
    """The shipped formulation's keep-first stage only (same output rows
    as window_variant): min(struct) per fingerprint + join-back."""
    paras = CU.split_paragraphs(docs)
    fp = paras.withColumn("fp", F.md5("para"))
    winners = fp.groupBy("fp").agg(F.min(F.struct("doc_id", "idx")).alias("w"))
    return fp.join(winners, "fp").where(
        (F.col("doc_id") == F.col("w.doc_id")) & (F.col("idx") == F.col("w.idx"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    args = ap.parse_args()

    spark = get_spark("para_hot", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(args.n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique lead paragraph number "),
            F.col("id").cast("string"),
            F.lit("\n\nsubscribe to our newsletter for the latest updates"),
            F.lit("\n\ntail "),
            (F.col("id") % 97).cast("string"),
        ).alias("ptext"),
    )

    t0 = time.time()
    n_agg = agg_variant(docs).count()
    agg_s = time.time() - t0

    t0 = time.time()
    n_win = window_variant(docs).count()
    win_s = time.time() - t0

    # shuffle-volume witness for the hot fingerprint: rows the hot key
    # sends through the exchange under each formulation
    n_parts = docs.rdd.getNumPartitions()
    print(
        f"n_docs={args.n}  keep-first stage: min-struct aggregate "
        f"{agg_s:.2f}s ({n_agg} kept)  ranking window {win_s:.2f}s "
        f"({n_win} kept)  | hot-key shuffle rows: agg ≈ {n_parts} "
        f"(1/input-partition after partial combine) vs window = {args.n} "
        f"(every copy into ONE task's sort)"
    )


if __name__ == "__main__":
    main()
