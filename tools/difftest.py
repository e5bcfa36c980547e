"""Local differential tester — mirrors the driver's Spark-vs-DuckDB check.

For every QueryDef with an oracle: run the Spark DataFrame and the DuckDB SQL
on the same parquet dir, then compare row count, column names, and
order-insensitive values (sorted rows, floats rounded to 6 significant
decimals). Run this before every commit; if it's green here, the driver's
CORRECTNESS gate should be green too.

Usage:
    python tools/difftest.py [--sf /root/testdata/sf0.001] [name ...]
    python tools/difftest.py --seed 7 [name ...]

--seed S (round-5 verdict #3): every synthetic probe corpus (URLs,
planted clones, spam probes, md5 gates, unicode decorations) derives
from id arithmetic over the fixture tables, so the oracles had only
ever been proven at ONE instantiation. With --seed, the fixture ids are
re-keyed by a seeded md5-rank permutation (documents.doc_id,
embeddings.vec_id, events.event_id — each a bijection onto the same
dense [0, N) id space, so clone offsets and modular probe selectors
stay valid) and the normal Spark-vs-DuckDB differential runs against
the re-keyed parquet. Every `doc_id % k` probe now selects different
rows, planted clones land at different ids, and every md5 keep-gate
sees different hashes — any constant overfit to the default layout
(hard-coded planted ids, probe counts, hash-tail assumptions) fails
the sweep. Both engines read the same re-keyed files, so green means
seed-independent, not merely fixture-reproducing.
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


def seeded_dir(base_sf: str, seed: int) -> str:
    """Materialize the seed-S re-keyed twin of `base_sf` (cached): ids are
    replaced by their rank under md5('seed{S}:' || id) — a deterministic
    bijection onto the same dense [0, N) space in both engines' view,
    since both read the same parquet output."""
    import shutil

    out = (
        f"/tmp/spark_graft_seed{seed}_"
        f"{os.path.basename(base_sf.rstrip('/'))}"
    )
    # The _DONE marker records a fingerprint (size:mtime_ns per table) of
    # the BASE parquet files: if the fixture is ever regenerated, the
    # cached twin is stale and must be rebuilt — a seed sweep silently
    # reusing a twin of the OLD fixture would green-light against data
    # nobody runs anymore (round-6 ADVICE #3).
    def _fingerprint() -> str:
        parts = []
        for t in sorted(TABLES):
            src = os.path.join(base_sf, f"{t}.parquet")
            if os.path.exists(src):
                st = os.stat(src)
                parts.append(f"{t}={st.st_size}:{st.st_mtime_ns}")
        return ";".join(parts)

    fp = _fingerprint()
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == fp:
                return out
        os.remove(done)  # stale twin: base fixture changed — rebuild
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def perm(col: str) -> str:
        return (
            f"CAST(row_number() OVER (ORDER BY "
            f"md5('seed{seed}:' || CAST({col} AS VARCHAR)), {col}) - 1 "
            f"AS BIGINT)"
        )

    remap = {
        "documents": f"SELECT {perm('doc_id')} AS doc_id, text, lang, "
        "source, n_chars FROM src",
        "embeddings": f"SELECT {perm('vec_id')} AS vec_id, embedding, "
        "label FROM src",
        "events": f"SELECT {perm('event_id')} AS event_id, ts, user_id, "
        "event_type, value, props FROM src",
    }
    for t in TABLES:
        src = os.path.join(base_sf, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        dst = os.path.join(out, f"{t}.parquet")
        if t in remap:
            con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}'")
            con.execute(
                f"COPY ({remap[t]}) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            shutil.copyfile(src, dst)
    with open(done, "w") as f:
        f.write(fp + "\n")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--seed", type=int, default=None,
                    help="re-key fixture ids under this seed and run the "
                    "differential against the re-keyed corpus")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.seed is not None:
        args.sf = seeded_dir(args.sf, args.seed)
        print(f"# seed {args.seed}: differential against {args.sf}")

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
