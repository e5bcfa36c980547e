"""Barrier-cut attribution for agg-mad-outliers (round-6 verdict #2).

r6's separated-sweep protocol reads 4.41 s warm vs 1.27 s same-run
DuckDB (3.5x) where r5's one-off probe had read 2.0x. This probe does
for mad-outliers what PERF.md:431-495 did for warc-corpus: time each
stage barrier so the wall is attributed to measured work, then measure
the candidate fusions the cuts indict.

Cuts (each forced with a noop write in a warmed session, best-of-N):
  scan    — lineitem (grp, v) projection only
  hist    — + groupBy(grp, v) count            [the compression agg]
  cum     — + per-grp cumulative window x2     [the first window chain]
  med     — + bracketing-rank median aggregate
  full    — the registry query end-to-end
  full_ckpt — the registry query with cum.localCheckpoint() (variant)

The initial plan (tools/explain.py) shows the full query scans lineitem
4x and replays the histogram 4x / the median window chain 3x with no
ReusedExchange; whether AQE dedupes them at runtime is exactly what
cuts make visible: if full ~= cum + small, AQE reuses; if full ~= 4x
scan + 3x cum, the lineage replays are real work and a localCheckpoint
of the histogram-sized `cum` pays.

Usage: python tools/bench_mad_cut.py [--sf /root/testdata/sf0.1] [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ai_knowledge_etl_spark.registry import REGISTRY
from ai_knowledge_etl_spark.session import get_spark


def build_cuts(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    x = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("v"),
    )
    hist = x.groupBy("grp", "v").agg(F.count("*").cast("long").alias("c"))
    wv = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("grp")
    cum = hist.select(
        "grp", "v", "c", F.sum("c").over(wv).cast("long").alias("cm")
    ).withColumn("cnt", F.max("cm").over(wall))
    lo = F.expr("(cnt + 1) div 2")
    hi = F.expr("(cnt + 2) div 2")
    in_lo = (F.col("cm") - F.col("c") < lo) & (lo <= F.col("cm"))
    in_hi = (F.col("cm") - F.col("c") < hi) & (hi <= F.col("cm"))
    zero2 = F.lit(0).cast("decimal(12,2)")
    med = cum.groupBy("grp").agg(
        (
            F.sum(F.when(in_lo, F.col("v")).otherwise(zero2))
            + F.sum(F.when(in_hi, F.col("v")).otherwise(zero2))
        )
        .cast("decimal(14,2)")
        .alias("med2"),
        F.max("cnt").cast("long").alias("cnt"),
    )
    return {"scan": x, "hist": hist, "cum": cum, "med": med}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("mad-cut-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def wall(df) -> float:
        best = float("inf")
        for _ in range(args.n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    cuts = build_cuts(spark, args.sf)
    # warm: footers, codegen, python workers
    cuts["med"].write.format("noop").mode("overwrite").save()
    REGISTRY["agg-mad-outliers"].spark(spark, args.sf).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {name: wall(df) for name, df in cuts.items()}

    # The registry query localCheckpoints its histogram, which EXECUTES at
    # build time — so the DataFrame must be rebuilt INSIDE the timer or
    # the checkpoint's cost (the scan + histogram + window chain) is
    # silently excluded. The first version of this probe made exactly
    # that mistake and read 1.55 s for a query whose honest warm wall is
    # ~3.3 s; build-in-timer is the fix.
    best = float("inf")
    for _ in range(args.n):
        t0 = time.time()
        REGISTRY["agg-mad-outliers"].spark(spark, args.sf).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.time() - t0)
    out["full"] = round(best, 3)
    print(json.dumps({"mad_cut": {"sf": args.sf, "best_of": args.n, **out}}))


if __name__ == "__main__":
    main()
