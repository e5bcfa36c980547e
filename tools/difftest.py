"""Local differential tester — mirrors the driver's Spark-vs-DuckDB check.

For every QueryDef with an oracle: run the Spark DataFrame and the DuckDB SQL
on the same parquet dir, then compare row count, column names, and
order-insensitive values (sorted rows, floats rounded to 6 significant
decimals). Run this before every commit; if it's green here, the driver's
CORRECTNESS gate should be green too.

Usage:
    python tools/difftest.py [--sf /root/testdata/sf0.001] [name ...]
    python tools/difftest.py --seed 7 [name ...]
    python tools/difftest.py --vocab wide [name ...]

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

--vocab wide (round-6 verdict #5): the fixture text has only ~31 word
types at any replication factor, so the text-quality family (LM gates,
Gopher, BPE, vocab-topk, perplexity buckets, PMI, minhash) had only
ever been differentially tested where vocabulary caps never bind,
top-K ties are pervasive, and the OOV path barely fires. This mode
materializes a WIDE-vocabulary twin of the documents table — each
token at (doc, pos) is suffixed with md5(doc:pos) % V, except a
deterministic 1/KEEP fraction kept verbatim so stopword/language
heuristics stay non-degenerate — generalizing the probe corpus that
tools/bench_lm_cap.py proved at K=2^15. Both engines read the SAME
rewritten parquet, so the differential is exact; the default query set
is WIDE_VOCAB_QUERIES (the vocabulary-sensitive family).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_knowledge_etl_spark.registry import REGISTRY, oracle_of
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
    oracle = oracle_of(qd)
    t0 = time.time()
    sdf = qd.spark(spark, sf_dir)
    if oracle is not None:
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
    if oracle is None:
        return True, f"rows-only ({len(s_rows)} rows, {t_spark:.1f}s)"
    t0 = time.time()
    # {SF_DIR} lets filesystem-scan oracles (read_blob manifests) target
    # the same fixture dir the Spark side reads
    res = con.execute(oracle.replace("{SF_DIR}", sf_dir))
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


def _base_fingerprint(base_sf: str) -> str:
    """size:mtime_ns per base parquet — the staleness key for cached
    twin corpora (round-6 ADVICE #3: a twin of a regenerated fixture
    must be rebuilt, not silently reused). A generator version is
    folded in so edits to the rewrite SQL itself also invalidate."""
    parts = ["gen=2"]  # v2: empty tokens kept verbatim (r7 ADVICE #4)
    for t in sorted(TABLES):
        src = os.path.join(base_sf, f"{t}.parquet")
        if os.path.exists(src):
            st = os.stat(src)
            parts.append(f"{t}={st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


def _twin_cached(out: str, fp: str) -> bool:
    """True if `out` holds a fresh twin of the fingerprinted base."""
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == fp:
                return True
        os.remove(done)  # stale twin: base fixture changed — rebuild
    return False


def _twin_done(out: str, fp: str) -> None:
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write(fp + "\n")


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
    fp = _base_fingerprint(base_sf)
    if _twin_cached(out, fp):
        return out
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
    _twin_done(out, fp)
    return out


# The vocabulary-sensitive family: every query whose semantics depend on
# token identity statistics (cap binding, top-K ties, OOV mass, n-gram
# uniqueness) rather than just text length/shape.
WIDE_VOCAB_QUERIES = [
    # unigram/bigram LM + perplexity
    "udf-unigram-logprob", "sample-perplexity-buckets",
    "text-bigram-perplexity",
    # BPE train/tokenize/pack
    "agg-bpe-merges", "agg-bpe-merges-n", "udf-bpe-tokenize",
    "pipeline-tokenize-pack", "pack-sequences",
    # vocabulary statistics / term weighting
    "agg-vocab-topk", "udf-token-count", "udf-tfidf-keywords",
    "text-bm25-rank", "text-collocations-pmi", "udf-lexical-diversity",
    # quality gates over the token stream
    "filter-quality-docs", "filter-repetition-gopher", "udf-readability",
    "udf-lang-detect", "filter-contamination-ngram",
    # shingle / signature dedup over the widened stream
    "dedup-ngram-jaccard", "dedup-minhash", "dedup-minhash-verified",
    "dedup-simhash", "dedup-containment",
    # DSIR + composed curation
    "sample-importance-reweight", "pipeline-curate-corpus",
]


def widevocab_dir(base_sf: str, v: int = 512, keep_mod: int = 4) -> str:
    """Materialize the wide-vocabulary twin of `base_sf` (cached): each
    token at (doc, pos) becomes `w || '_' || md5(doc:pos) % v`, except
    tokens where md5 % keep_mod == 0 which stay verbatim (so stopword /
    language heuristics keep firing on real words). Whitespace layout
    (including newlines embedded in 'tokens') survives the split/rejoin,
    so paragraph- and line-based metrics still see structure. n_chars is
    recomputed from the rewritten text so derived stats stay
    self-consistent. All other tables are copied verbatim. Built ONCE in
    DuckDB; both engines read the same output parquet."""
    import shutil

    out = (
        f"/tmp/spark_graft_widevocab_v{v}k{keep_mod}_"
        f"{os.path.basename(base_sf.rstrip('/'))}"
    )
    fp = _base_fingerprint(base_sf)
    if _twin_cached(out, fp):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    src = os.path.join(base_sf, "documents.parquet")
    h = (
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
        "CAST(i AS VARCHAR)), 1, 8))::BIGINT"
    )
    con.execute(
        f"""
        COPY (
          WITH toks AS (
            SELECT doc_id, i,
                   CASE WHEN w = '' THEN w  -- runs of spaces stay runs
                        WHEN {h} % {keep_mod} = 0 THEN w
                        ELSE w || '_' || CAST({h} % {v} AS VARCHAR)
                   END AS w
            FROM (
              SELECT doc_id, ws[i] AS w, i
              FROM (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM '{src}' WHERE text IS NOT NULL AND text <> ''),
                   unnest(generate_series(1, len(ws))) t(i)
            )
          ),
          rebuilt AS (
            SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text
            FROM toks GROUP BY doc_id
          )
          SELECT d.doc_id,
                 coalesce(r.text, d.text) AS text,
                 d.lang, d.source,
                 CASE WHEN r.text IS NULL THEN d.n_chars
                      ELSE length(r.text) END AS n_chars
          FROM '{src}' d LEFT JOIN rebuilt r USING (doc_id)
        ) TO '{os.path.join(out, "documents.parquet")}' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        if t == "documents":
            continue
        s = os.path.join(base_sf, f"{t}.parquet")
        if os.path.exists(s):
            shutil.copyfile(s, os.path.join(out, f"{t}.parquet"))
    _twin_done(out, fp)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--seed", type=int, default=None,
                    help="re-key fixture ids under this seed and run the "
                    "differential against the re-keyed corpus")
    ap.add_argument("--vocab", choices=["wide"], default=None,
                    help="rewrite documents.text to a wide vocabulary "
                    "(md5 token suffixing) and run the text-quality "
                    "family against the rewritten corpus")
    ap.add_argument("--vocab-mult", type=int, default=512,
                    help="suffix modulus V for --vocab wide")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.seed is not None:
        args.sf = seeded_dir(args.sf, args.seed)
        print(f"# seed {args.seed}: differential against {args.sf}")
    if args.vocab == "wide":
        args.sf = widevocab_dir(args.sf, v=args.vocab_mult)
        if not args.names:
            args.names = [n for n in WIDE_VOCAB_QUERIES if n in REGISTRY]
            missing = [n for n in WIDE_VOCAB_QUERIES if n not in REGISTRY]
            if missing:
                print(f"# WARN: not in REGISTRY: {' '.join(missing)}")
        print(f"# vocab wide (V={args.vocab_mult}): differential "
              f"against {args.sf}")

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
    for i, name in enumerate(names):
        if i % 50 == 49:
            # drop the operators' tracked per-call persist() blocks so a
            # full 293-query run doesn't accumulate pinned storage
            from ai_knowledge_etl_spark.session import release_persisted

            release_persisted()
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
