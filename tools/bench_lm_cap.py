"""Exercise the capped-LM family at a REAL-scale K (round-5 verdict #6).

The registry runs the capped unigram LM at UNIGRAM_VOCAB_TOPK=24 so the
cap binds on the 31-type fixture vocabulary and the OOV path is
differentially tested. That proves correctness of the cap semantics but
never measures the two costs that matter when K is production-sized:

  1. the TakeOrderedAndProject driver merge at K = 2^15 (each task ships
     its top-K rows to the driver; merge cost ~ tasks x K), and
  2. scoring through a K+1-row broadcast instead of a 25-row one.

The fixture text cannot exercise this (31 types total at any replication
factor), so this probe derives a WIDE-vocabulary token stream from the
scaled documents table: each base token is suffixed with a per-(doc,pos)
md5 slice modulo V, giving ~31*V distinct types deterministically in both
engines. With V=4096 the stream has ~126k types, so K=2^15=32768 is large
AND binding (the OOV bucket carries real mass).

Checks, per run:
  - the LM artifact is EXACTLY K rows (the bounded-broadcast claim),
  - Spark avg_logprob == DuckDB oracle_lm_ctes at the same cap
    (value-exact differential over every doc),
  - wall times for the artifact build (the TakeOrderedAndProject merge)
    and the full scoring pass, at sf0.1 and at --mult x.

Usage:
    python tools/bench_lm_cap.py [--mult 100] [--dir /tmp/spark_graft_sf1]
                                 [--cap 32768] [--vocab-mult 4096]
(--dir must already contain the scaled tables: run tools/scale_sweep.py
 first, or point at /root/testdata/sf0.1 for a quick pass.)

Measured result recorded in docs/PERF.md (round-6 section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import lm
from ai_knowledge_etl_spark.operators.sketches import duck_md5_slice, md5_slice
from ai_knowledge_etl_spark.session import get_spark

# one row per (doc, position): token = base word + '_' + md5(doc:pos) % V
_TOKS_SQL = """
SELECT doc_id,
       w || '_' || CAST({h} % {V} AS VARCHAR) AS w
FROM (
  SELECT doc_id, ws[i] AS w, i
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       unnest(generate_series(1, len(ws))) t(i)
)
"""


def spark_toks(spark, sf_dir: str, v: int):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i0", "w")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "w")
    h = md5_slice(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.col("i").cast("string")
        ),
        1,
        8,
    )
    return pos.select(
        "doc_id",
        F.concat(F.col("w"), F.lit("_"), (h % v).cast("string")).alias("w"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cap", type=int, default=32768)
    ap.add_argument("--vocab-mult", type=int, default=4096)
    args = ap.parse_args()

    spark = get_spark("lm-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    toks = spark_toks(spark, args.dir, args.vocab_mult)

    # warm (parquet footers, codegen)
    toks.limit(1000).count()

    t0 = time.time()
    n_toks = toks.count()
    t_scan = time.time() - t0

    t0 = time.time()
    artifact = lm.capped_lm_table(toks, "w", args.cap).collect()
    t_artifact = time.time() - t0

    t0 = time.time()
    scored = lm.avg_logprob(toks, cap=args.cap)
    n_docs = scored.count()
    t_score = time.time() - t0

    n_types = toks.select("w").distinct().count()
    binding = n_types > args.cap

    # full-value differential vs the DuckDB oracle at the same cap
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(args.dir, 'documents.parquet')}'"
    )
    h = duck_md5_slice("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)", 1, 8)
    toks_cte = _TOKS_SQL.format(h=h, V=args.vocab_mult)
    oracle = f"""
WITH toks AS ({toks_cte}),
{lm.oracle_lm_ctes('toks', args.cap)}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(lp), 3) AS avg_logprob
FROM lmtoks GROUP BY doc_id
"""
    want = {
        r[0]: (r[1], r[2]) for r in con.execute(oracle).fetchall()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in scored.collect()
    }
    mismatches = sum(
        1
        for k in want
        if k not in got
        or got[k][0] != want[k][0]
        or abs((got[k][1] or 0) - (want[k][1] or 0)) > 1e-9
    ) + sum(1 for k in got if k not in want)

    print(
        json.dumps(
            {
                "lm_cap_probe": {
                    "dir": args.dir,
                    "cap": args.cap,
                    "n_tokens": n_toks,
                    "n_types": n_types,
                    "cap_binding": binding,
                    "artifact_rows": len(artifact),
                    "t_scan_s": round(t_scan, 2),
                    "t_artifact_s": round(t_artifact, 2),
                    "t_score_s": round(t_score, 2),
                    "n_docs": n_docs,
                    "oracle_mismatches": mismatches,
                }
            }
        )
    )
    sys.exit(1 if (mismatches or len(artifact) != min(args.cap, n_types)) else 0)


if __name__ == "__main__":
    main()
