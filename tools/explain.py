"""Print the physical plan of any registry query — the operability
surface for "is this the plan I'd want at 100 TB?" (exchange count,
pushed filters, broadcast choices, codegen spans).

Usage:
  python tools/explain.py <query-name> [more-names...] [--sf DIR]
                          [--mode formatted|extended|cost]
  python tools/explain.py --summary            # exchange/smell census

--summary walks the whole registry and prints one line per query:
exchange count, broadcast joins, sort-merge joins, and any plan smells
(CartesianProduct / BroadcastNestedLoopJoin / SinglePartition /
BatchEvalPython) — the same smell set tests/test_plans.py audits, as a
browsable report instead of an assertion.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_knowledge_etl_spark.registry import REGISTRY, _load_all  # noqa: E402
from ai_knowledge_etl_spark.session import get_spark  # noqa: E402

_SMELLS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SinglePartition",
    "BatchEvalPython",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--mode", default="formatted",
                    choices=["formatted", "extended", "cost", "simple"])
    ap.add_argument("--summary", action="store_true",
                    help="one-line exchange/smell census for every query")
    args = ap.parse_args()

    _load_all()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    names = args.names or (sorted(REGISTRY) if args.summary else [])
    if not names:
        ap.error("pass query names or --summary")
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    for name in names:
        try:
            df = REGISTRY[name].spark(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — census must not die mid-walk
            print(f"{name:36s} ERROR {type(e).__name__}: {str(e)[:80]}")
            continue
        if args.summary:
            n_ex = len(re.findall(r"Exchange", plan))
            n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
            n_smj = len(re.findall(r"SortMergeJoin", plan))
            smells = ",".join(s for s in _SMELLS if s in plan) or "-"
            print(f"{name:36s} exchanges={n_ex:<3d} bcast={n_bhj:<2d} "
                  f"smj={n_smj:<2d} smells={smells}")
        else:
            print(f"=== {name} ===")
            df.explain(mode=args.mode)


if __name__ == "__main__":
    main()
