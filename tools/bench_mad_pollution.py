"""Pin the agg-mad-outliers sweep-vs-solo gap mechanism (round-7 #7).

r8's randomized-order sweeps removed the alphabetical-neighbor
explanation, yet the sweep-context wall still reads ~0.7-0.9 s above a
solo probe. This probe measures the residual directly: in ONE warmed
session, the query's warm wall is taken (a) solo, (b) immediately after
a heavy polluting set (the sweep's own heavy neighbors, run once each),
and (c) after the same polluting set followed by an explicit
`gc.collect()` + JVM `System.gc()`. If (b) >> (a) and (c) ≈ (a), the
residual is COLLECTIBLE session garbage (Py4J/DataFrame temporaries +
JVM heap pressure) — order-independent, damped only by collection at
measurement boundaries, which is exactly what bench.py's inter-pass
gc.collect() does for the concurrent passes but the isolated sweep only
does every 50 queries. If (c) ≈ (b), it is warm-code/cache state and no
collection policy will close it.

Usage: python tools/bench_mad_pollution.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_knowledge_etl_spark.registry import REGISTRY
from ai_knowledge_etl_spark.session import get_spark

POLLUTERS = [
    "dedup-cluster-cc",
    "pipeline-training-set",
    "pipeline-curate-corpus",
    "dedup-image-phash",
    "agg-bpe-merges-n",
    "pipeline-tokenize-pack",
    "sample-perplexity-buckets",
    "text-collocations-pmi",
    "agg-basket-pairs",
    "dedup-substring-span",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("mad-pollution-probe", adaptive=False,
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.time()
        REGISTRY[name].spark(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    def jvm_gc() -> None:
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # warm everything once: the target + the polluters
    run("agg-mad-outliers")
    for p in POLLUTERS:
        run(p)

    out: dict[str, list[float]] = {"solo": [], "polluted": [], "polluted_gc": []}
    for _ in range(args.n):
        # (a) solo: collect first so the measurement starts clean
        jvm_gc()
        out["solo"].append(round(run("agg-mad-outliers"), 3))
        # (b) polluted: heavy set immediately before, no collection
        for p in POLLUTERS:
            run(p)
        out["polluted"].append(round(run("agg-mad-outliers"), 3))
        # (c) polluted + explicit collection
        for p in POLLUTERS:
            run(p)
        jvm_gc()
        out["polluted_gc"].append(round(run("agg-mad-outliers"), 3))

    summary = {k: {"best": min(v), "walls": v} for k, v in out.items()}
    print(json.dumps({"mad_pollution": {"sf": args.sf, **summary}}))


if __name__ == "__main__":
    main()
