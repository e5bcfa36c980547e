"""Local differential tester — mirrors the driver's Spark-vs-DuckDB check.

For every QueryDef with an oracle: run the Spark DataFrame and the DuckDB SQL
on the same parquet dir, then compare row count, column names, and
order-insensitive values (sorted rows, floats rounded to 6 significant
decimals). Run this before every commit; if it's green here, the driver's
CORRECTNESS gate should be green too.

Usage:
    python tools/difftest.py [--sf /root/testdata/sf0.001] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_knowledge_etl_spark.registry import REGISTRY
from ai_knowledge_etl_spark.session import get_spark
from ai_knowledge_etl_spark.sources.catalog import TABLES


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # round to 9 significant digits to absorb summation-order noise
        return round(v, 9 - 1 - int(math.floor(math.log10(abs(v)))))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in idx], out


def run_one(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    qd = REGISTRY[name]
    t0 = time.time()
    sdf = qd.spark(spark, sf_dir)
    if qd.oracle is not None:
        # Driver-canonicalizer contract (registry/__init__ parity notes):
        # pandas-based row sorting crashes on list/dict cells, so oracled
        # queries must emit scalar-only top-level columns.
        from pyspark.sql.types import ArrayType, MapType, StructType

        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            return False, (
                f"COMPLEX top-level columns {complex_cols} — driver "
                "canonicalizer cannot hash these; project scalars/to_json"
            )
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0
    if qd.oracle is None:
        return True, f"rows-only ({len(s_rows)} rows, {t_spark:.1f}s)"
    t0 = time.time()
    # {SF_DIR} lets filesystem-scan oracles (read_blob manifests) target
    # the same fixture dir the Spark side reads
    res = con.execute(qd.oracle.replace("{SF_DIR}", sf_dir))
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    t_duck = time.time() - t0

    if sorted(s_cols) != sorted(d_cols):
        return False, f"SCHEMA spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"ROWCOUNT spark={len(s_rows)} duck={len(d_rows)}"
    _, ns = _norm_rows(s_cols, s_rows)
    _, nd = _norm_rows(d_cols, d_rows)
    if ns != nd:
        diffs = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b][:3]
        detail = "; ".join(
            f"row{i}: spark={ns[i]!r} duck={nd[i]!r}" for i in diffs
        )
        return False, f"VALUES differ at {len([1 for a,b in zip(ns,nd) if a!=b])} rows: {detail}"
    return True, f"OK ({len(s_rows)} rows, spark {t_spark:.1f}s, duck {t_duck:.2f}s)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    con = duckdb.connect()
    # cap DuckDB: its default memory_limit is 80 percent of RAM with no
    # temp dir, which at the 100x sweep OOM-killed the whole process
    # (kernel SIGKILL at ~113 GB). Capped + spillable, heavy oracles
    # spill to /tmp instead of dying.
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )
    spark = get_spark("difftest")
    names = args.names or sorted(REGISTRY)
    failed = []
    for name in names:
        try:
            ok, msg = run_one(spark, con, name, args.sf)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
