"""Skew-join evidence harness (docs/PERF.md): measures a skewed shuffle
join plain vs salted (operators/partitioning.salted_join) vs AQE skew-split.

Synthesizes a fact table where ONE hot key owns `hot_frac` (default 0.9) of all rows —
the 100 TB failure mode where a single reducer gets the celebrity key and
the stage runs at 1/32 parallelism. Broadcast is disabled so the join
must shuffle (at 100 TB the dim side is too big to broadcast anyway).

Run: python tools/bench_skew.py [n_rows]   (default 20_000_000)
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

from ai_knowledge_etl_spark.operators.partitioning import salted_join


def build(spark: SparkSession, n_rows: int, n_keys: int, hot_frac: float):
    # deterministic skew: first hot_frac of ids -> key 0, rest uniform
    fact = spark.range(n_rows, numPartitions=32).select(
        F.when(F.col("id") % 100 < int(hot_frac * 100), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 997).alias("w")
    )
    return fact, dim


def run(tag: str, joined) -> dict:
    t0 = time.monotonic()
    row = joined.groupBy().agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).collect()[0]
    return {
        "config": tag,
        "sec": round(time.monotonic() - t0, 2),
        "rows": row["n"],
        "checksum": row["s"],
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark, n_rows, n_keys=100_000, hot_frac=0.9)
    fact.persist().count()
    dim.persist().count()

    results = []
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    results.append(run("plain-shuffle-join-aqe-off", fact.join(dim, "k")))
    results.append(
        run("salted-join-16-aqe-off", salted_join(fact, dim, "k", n_salts=16))
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results.append(run("plain-shuffle-join-aqe-skew", fact.join(dim, "k")))
    results.append(
        run("salted-join-16-aqe-on", salted_join(fact, dim, "k", n_salts=16))
    )
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
