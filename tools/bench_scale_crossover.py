"""Generic floor-vs-scale crossover probe (round-9 verdict #1/#2).

A composed query stuck >2× DuckDB at sf0.1 while its stage audit says
the wall is per-job scheduling floor (not data work) has one honest
adjudication: grow the fixture until the floor amortizes and see whether
the ratio crosses below 1. pipeline-warc-corpus proved the pattern in
round 9 (2.8× at sf0.1 → 0.57× at 10× distinct); this tool generalizes
tools/bench_warc_scale.py to ANY registered query and persists the
evidence where bench.py can surface it: docs/scale_crossover.json is
COMMITTED, and every bench run copies it into BENCH_DETAIL's
`scale_crossover` block — so the driver-visible artifact carries the
adjudication instead of PERF.md prose (round-9 verdict #2).

The fixture is the scale_sweep DISTINCT-entity synthesis (fresh doc
texts / keys — no replica artifacts that a dedup query would collapse),
so both engines do real growing work on the identical parquet.

Usage: python tools/bench_scale_crossover.py [--mult 10] [--n 3]
           [--out DIR] [--skip-gen] [--no-write] [name ...]
       default queries: pipeline-warc-corpus dedup-cluster-cc
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from ai_knowledge_etl_spark.registry import REGISTRY, oracle_of
from ai_knowledge_etl_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

EVIDENCE_PATH = os.path.join(REPO, "docs", "scale_crossover.json")

DEFAULT_QUERIES = ["pipeline-warc-corpus", "dedup-cluster-cc"]


def probe(names: list[str], out_dir: str, mult: int, n: int) -> dict:
    """Run each named query on both engines over the synthesized fixture;
    return {name: evidence}. Spark first (one session for all queries),
    then DuckDB after spark.stop() — same discipline as bench.py's
    post-stop baseline so the 16 GB JVM heap never competes with duck."""
    spark = get_spark("scale-crossover", adaptive=False, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{out_dir}/documents.parquet").count()
    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    spark_walls: dict[str, list[float]] = {}
    for name in names:
        qd = REGISTRY[name]
        walls = []
        for _ in range(n):
            t0 = time.time()
            qd.spark(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
        spark_walls[name] = walls
    spark.stop()

    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{out_dir}/{t}.parquet'"
        )
    results = {}
    for name in names:
        sql = oracle_of(REGISTRY[name])
        if sql is None:
            results[name] = {"error": "no oracle SQL (oracle_fn replay)"}
            continue
        sql = sql.replace("{SF_DIR}", out_dir)
        ducks = []
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            ducks.append(round(time.time() - t0, 3))
        results[name] = {
            "mult": mult,
            "entities": "distinct",
            "spark_walls": spark_walls[name],
            "spark": min(spark_walls[name]),
            "duck_walls": ducks,
            "duck": min(ducks),
            "ratio": round(min(spark_walls[name]) / min(ducks), 3),
        }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/spark_graft_crossover")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument(
        "--no-write",
        action="store_true",
        help="print evidence without merging docs/scale_crossover.json",
    )
    args = ap.parse_args()
    names = args.names or DEFAULT_QUERIES

    if not args.skip_gen:
        import scale_sweep as SS

        SS.generate(args.mult, args.out, distinct=True)

    results = probe(names, args.out, args.mult, args.n)
    print(json.dumps({"scale_crossover": results}, indent=1))

    if not args.no_write:
        merged = {}
        if os.path.exists(EVIDENCE_PATH):
            with open(EVIDENCE_PATH) as f:
                merged = json.load(f)
        merged.update(results)
        with open(EVIDENCE_PATH, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"# merged into {EVIDENCE_PATH}", file=sys.stderr)


if __name__ == "__main__":
    main()
