"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the `noop` sink so Catalyst cannot
prune the work away (a bare .count() would skip projections entirely).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_knowledge_etl_spark.registry import REGISTRY
from ai_knowledge_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    # AQE off: at sf0.1 (~100 MB) runtime re-planning costs ~2× wall and buys
    # nothing; production sessions keep it on (see session.get_spark).
    spark = get_spark("bench", adaptive=False)
    # warm the JVM + parquet footers once so per-query times measure the query
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        qd = REGISTRY[name]
        t0 = time.time()
        df = qd.spark(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
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
