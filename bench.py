"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

- Each query is fully materialized through the `noop` sink so Catalyst
  cannot prune the work away (a bare .count() would skip projections).
- Queries run CONCURRENTLY (8 submitter threads, FAIR scheduler): the Spark
  scheduler interleaves their jobs across the 32 cores exactly as a
  multi-tenant cluster would, so total wall measures engine throughput
  rather than 92× the per-job scheduling floor. Per-query numbers therefore
  include queue time — read them as relative weight, not isolated latency.
- AQE off: at sf0.1 (~100 MB) runtime re-planning costs ~2× wall and buys
  nothing; production sessions keep it on (see session.get_spark).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_knowledge_etl_spark.registry import REGISTRY
from ai_knowledge_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_WORKERS = int(os.environ.get("SPARK_GRAFT_BENCH_WORKERS", "8"))


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("bench", adaptive=False)
    spark.sparkContext.setLocalProperty("spark.scheduler.mode", "FAIR")
    # warm the JVM + parquet footers once so timings measure the queries
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    def run(name: str) -> tuple[str, float]:
        t0 = time.time()
        REGISTRY[name].spark(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return name, round(time.time() - t0, 3)

    t0 = time.time()
    with ThreadPoolExecutor(N_WORKERS) as ex:
        timings = dict(ex.map(run, sorted(REGISTRY)))
    total = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
