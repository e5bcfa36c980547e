"""Barrier-cut attribution for pipeline-warc-corpus (round-7 verdict #1).

The mad-outliers playbook applied to the composed Common-Crawl entry
pipeline: instead of duplicating the chain in the probe (drift risk),
pipeline.curate_warc_corpus carries a probe hook (`pipeline._STAGE_CLOCK`)
that records a wall-clock mark after each eager localCheckpoint
materializes. The gap between marks IS the stage's materialization cost
(checkpoints execute at build time); everything after the last mark —
paragraph dedup is checkpointed mid-way, then LSH candidates + DSIR
scoring + top-k run lazily to the sink — lands in the "tail" bucket.

Build-in-timer discipline (the r7 probe-bug lesson, PERF.md:795-805):
the registry callable is rebuilt INSIDE the timer every rep, because the
checkpoints execute at build time.

Usage: python tools/bench_warc_cut.py [--sf /root/testdata/sf0.1] [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_knowledge_etl_spark import pipeline as P
from ai_knowledge_etl_spark.registry import REGISTRY
from ai_knowledge_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("warc-cut-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qd = REGISTRY["pipeline-warc-corpus"]

    def run() -> tuple[float, dict[str, float]]:
        P._STAGE_CLOCK = []
        t0 = time.time()
        qd.spark(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        marks = P._STAGE_CLOCK
        P._STAGE_CLOCK = None
        stages: dict[str, float] = {}
        for (s0, t_a), (s1, t_b) in zip(marks, marks[1:]):
            stages[s1] = round(t_b - t_a, 3)
        if marks:
            stages["tail"] = round(t0 + wall - marks[-1][1], 3)
        return round(wall, 3), stages

    run()  # warm: fixture cache, codegen, python workers
    best_wall, best_stages = float("inf"), {}
    reps = []
    for _ in range(args.n):
        wall, stages = run()
        reps.append(wall)
        if wall < best_wall:
            best_wall, best_stages = wall, stages

    # same-run DuckDB twin for the honest ratio
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    from ai_knowledge_etl_spark.registry import oracle_of
    sql = oracle_of(qd).replace("{SF_DIR}", args.sf)
    con.execute(sql).fetchall()  # warm
    duck = min(
        (lambda t0: (con.execute(sql).fetchall(), time.time() - t0)[1])(
            time.time()
        )
        for _ in range(args.n)
    )
    print(json.dumps({
        "warc_cut": {
            "sf": args.sf,
            "best_of": args.n,
            "walls": reps,
            "best_wall": best_wall,
            "stages": best_stages,
            "duck": round(duck, 3),
            "ratio": round(best_wall / duck, 2),
        }
    }))


if __name__ == "__main__":
    main()
