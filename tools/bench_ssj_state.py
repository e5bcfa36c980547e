"""A/B the stream-stream joins' state-store backend (round-6 verdict #4).

The two stream-stream joins are the 300x sweep's worst exponents
(0.90 / 0.81, ~780 s walls) and are state-store bound: the join holds 4
stores per shuffle partition, and the HDFS-backed default keeps each
store's full map ON-HEAP and re-writes a full snapshot per batch. This
probe runs the REAL registry streaming passes (_run_stream_interval_join
/ _run_stream_outer_join — staging, checkpoint, availableNow pass(es),
parquet sink) under both providers via the
SPARK_GRAFT_SSJ_STATE_PROVIDER knob and reports walls + sink-row
equality. RocksDB runs with changelog checkpointing (per-batch deltas,
periodic snapshots) — the production configuration for large keyed
state.

Usage:
    python tools/bench_ssj_state.py [--mult 100] [--dir /tmp/spark_graft_sf1]
                                    [--skip-gen] [--queries inner outer]
(--dir must contain the scaled tables unless --skip-gen is absent, in
 which case they are synthesized by tools/scale_sweep.generate.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

from ai_knowledge_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--queries", nargs="*", default=["inner", "outer"])
    args = ap.parse_args()

    if not args.skip_gen:
        from scale_sweep import generate

        t0 = time.time()
        generate(args.mult, args.dir)
        print(f"# generated {args.mult}x in {time.time()-t0:.1f}s",
              file=sys.stderr)

    spark = get_spark("ssj-state-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from ai_knowledge_etl_spark.registry.streaming import (
        _run_stream_interval_join,
        _run_stream_outer_join,
    )

    runners = {
        "inner": _run_stream_interval_join,
        "outer": _run_stream_outer_join,
    }
    out: dict = {"mult": args.mult}
    for qname in args.queries:
        rows = {}
        for provider in ("hdfs", "rocksdb"):
            os.environ["SPARK_GRAFT_SSJ_STATE_PROVIDER"] = provider
            t0 = time.time()
            sink = runners[qname](spark, args.dir)
            wall = round(time.time() - t0, 1)
            n = spark.read.parquet(sink).count()
            rows[provider] = n
            out[f"{qname}_{provider}_s"] = wall
            print(f"{qname:6s} {provider:8s} {wall:8.1f}s  {n} pairs",
                  file=sys.stderr)
        out[f"{qname}_rows_equal"] = rows["hdfs"] == rows["rocksdb"]
    print(json.dumps({"ssj_state_probe": out}))


if __name__ == "__main__":
    main()
