"""A/B harness for join-scd2-pointintime plan shapes (round 11).

The r10 artifact flags the query at 2.11x its same-window duck twin with
no committed crossover evidence. Its docstring already names the
committed alternative: the union-and-LOCF as-of form (operators/asof.py)
— one window pass, no version fan-out. Equivalence argument (proved by
full-result comparison here and by difftest after landing): the SCD2
intervals are half-open, non-overlapping, and chained by
lead(valid_from) over (valid_from, orderkey), so a fact at `ship`
matches exactly the version with the greatest (valid_from, orderkey)
among valid_from <= ship — which is what last() over the union sorted
by (ts, is_ref desc, okey) carries. Zero-width intervals (equal-date
versions) lose to the later orderkey in both forms; facts before the
first version match nothing in both forms.

Shapes:
  A current — lead-window hist + equi join with range post-filter.
  B asof    — union facts+versions, one LOCF window pass per custkey.

Usage: python tools/bench_scd2_shapes.py [--sf DIR] [--n 3]
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

from ai_knowledge_etl_spark.session import get_spark


def shape_a(spark, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.registry import REGISTRY

    return REGISTRY["join-scd2-pointintime"].spark(spark, sf_dir)


def shape_b(spark, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    versions = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("is_ref"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderpriority").alias("segment"),
        F.lit(None).cast("long").alias("price_c"),
    )
    facts = (
        li.join(
            o.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .select(
            F.col("o_custkey").alias("k"),
            F.col("l_shipdate").alias("ts"),
            F.lit(0).alias("is_ref"),
            F.lit(None).cast("long").alias("okey"),
            F.lit(None).cast("string").alias("segment"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("price_c"),
        )
    )
    u = versions.unionByName(facts)
    w = (
        Window.partitionBy("k")
        .orderBy(
            F.col("ts").asc(),
            F.col("is_ref").desc(),
            F.col("okey").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "is_ref",
        "price_c",
        F.last(
            F.when(F.col("is_ref") == 1, F.col("segment")), ignorenulls=True
        )
        .over(w)
        .alias("seg"),
    )
    return (
        carried.where((F.col("is_ref") == 0) & F.col("seg").isNotNull())
        .groupBy(F.col("seg").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("price_c").cast("long").alias("revenue_c"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("scd2-ab", adaptive=False, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    shapes = {"A-current": shape_a, "B-asof": shape_b}
    ref = None
    for name, fn in shapes.items():
        rows = sorted(map(tuple, fn(spark, args.sf).collect()))
        if ref is None:
            ref = rows
            print(f"# {name}: {len(rows)} rows (reference) {rows}")
        else:
            same = rows == ref
            print(f"# {name}: identical={same}")
            if not same:
                print(rows)
                raise SystemExit(f"{name} DIVERGES — not a valid shape")
    for name, fn in shapes.items():
        walls = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"scd2 {name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        print(f"{name}: {walls} min={min(walls)}")
    spark.stop()


if __name__ == "__main__":
    main()
