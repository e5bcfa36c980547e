"""Hot-shingle df-cap evidence harness (docs/PERF.md, VERDICT r1 #6).

Synthesizes a dup corpus where every document shares `n_boiler` boilerplate
shingles (license headers, nav chrome — the 100 TB reality), then measures
the blocked Jaccard candidate stage with and without
`dedup.cap_shingle_df`. The uncapped join fans each boilerplate shingle out
to n_docs² candidate rows; the cap removes those keys entirely.

Run: python tools/bench_shingle_cap.py [n_docs] [n_boiler]
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

from ai_knowledge_etl_spark.operators import dedup


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_boiler = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    boiler = " ".join(f"boiler{i} common header" for i in range(n_boiler))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 8).cast("string").alias("source"),
        F.concat(
            F.lit(boiler + " "),
            F.lit("doc body token "),
            F.col("id").cast("string"),
            F.lit(" tail "),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
    )
    sh = dedup.shingles(docs, "doc_id", "text", n=3, keep=("source",)).persist()
    sh.count()
    for tag, table in (
        ("uncapped", sh),
        ("df_cap_100", dedup.cap_shingle_df(sh, "doc_id", 100, "source")),
    ):
        t0 = time.monotonic()
        # the candidate stage only (where the fanout lives): blocked
        # equi-join + pair count, same shape as jaccard_pairs' inter step
        a, b = table.alias("a"), table.alias("b")
        n_pairs = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.source") == F.col("b.source"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy("a.doc_id", "b.doc_id")
            .count()
            .count()
        )
        print(
            json.dumps(
                {
                    "config": tag,
                    "sec": round(time.monotonic() - t0, 2),
                    "candidate_pairs": n_pairs,
                    "n_docs": n_docs,
                    "n_boiler_shingles": n_boiler,
                }
            )
        )


if __name__ == "__main__":
    main()
