"""Oracle-skeleton near-duplicate audit (round-5 verdict #8).

At registry saturation (292 oracled queries) the risk flips from missing
coverage to REDUNDANT coverage: two queries whose oracle SQLs are the same
shape over the same tables add registry weight without adding evidence —
the duplicate-id guard caught exactly one such pair by hand in round 5
(RFM over events vs orders). This tool makes that audit mechanical.

Method: normalize every oracle SQL into a *skeleton* —
  - lowercase, comments stripped, whitespace collapsed,
  - string literals -> 'S', numeric literals -> 0,
  - column aliases (AS x) -> AS A (an alias rename is not a semantic
    difference; the md5-tag hashes etc. differ only in literals anyway)
— then group by skeleton hash. Identical skeletons = structurally identical
queries differing only in constants/aliases; those pairs are printed for a
human verdict (some are LEGITIMATE: e.g. parameterized variants that
deliberately test the same shape through different API surfaces — the
report says what to look at, it does not auto-delete).

A second, fuzzier pass reports near-misses: skeleton token-shingle Jaccard
>= --near (default 0.9) between queries on the SAME table set. This catches
the "same query re-derived over a different fact table" family without
drowning the report in every GROUP BY lookalike.

Usage:
    python tools/oracle_audit.py [--near 0.9] [--json out.json]

Exit code 0 always (audit, not gate); tests/test_registry.py pins the
known-exact-duplicate count so accidental growth fails CI.
"""

from __future__ import annotations

import argparse
import hashlib
import itertools
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_knowledge_etl_spark.registry import REGISTRY, oracle_of

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def skeletonize(sql: str) -> str:
    """Collapse an oracle SQL to its structural skeleton."""
    s = sql.lower()
    s = re.sub(r"--[^\n]*", " ", s)  # line comments
    s = re.sub(r"/\*.*?\*/", " ", s, flags=re.S)  # block comments
    s = re.sub(r"'([^']|'')*'", "'S'", s)  # string literals
    # numeric literals (ints, floats, scientific) -> 0; keep DECIMAL(38,0)
    # style type parameters intact by only rewriting numbers NOT preceded
    # by '(' of a type name — simpler: rewrite all, types normalize too,
    # which is fine for a shape hash.
    s = re.sub(r"\b\d+(\.\d+)?([eE][+-]?\d+)?\b", "0", s)
    # Output aliases -> 'as A', but NOT cast targets: CAST(x AS BIGINT)
    # and CAST(x AS DOUBLE) differ semantically, and erasing the type
    # would hash two type-distinct oracles as exact skeleton duplicates
    # (round-6 ADVICE #4). Negative lookahead on the SQL type keywords.
    _types = (
        "bigint|int|integer|smallint|tinyint|hugeint|double|float|real|"
        "decimal|numeric|varchar|text|string|char|boolean|bool|date|"
        "timestamp|time|interval|blob|bytea|uuid|json|struct|row|map|array"
    )
    s = re.sub(rf"\bas\s+(?!(?:{_types})\b)[a-z_][a-z0-9_]*", "as A", s)
    s = re.sub(r"\s+", " ", s).strip()
    return s


def tables_of(sql: str) -> tuple[str, ...]:
    s = sql.lower()
    return tuple(
        t for t in TABLES if re.search(rf"\b(from|join)\s+{t}\b", s)
    )


def shingles(skel: str, k: int = 4) -> set[tuple[str, ...]]:
    toks = skel.split()
    if len(toks) < k:
        return {tuple(toks)}
    return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--near", type=float, default=0.9)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    skels: dict[str, str] = {}
    for name in sorted(REGISTRY):
        sql = oracle_of(REGISTRY[name])
        if sql:
            skels[name] = skeletonize(sql)

    by_hash: dict[str, list[str]] = defaultdict(list)
    for name, sk in skels.items():
        by_hash[hashlib.sha256(sk.encode()).hexdigest()[:16]].append(name)
    exact_groups = sorted(
        [sorted(v) for v in by_hash.values() if len(v) > 1]
    )

    # near-miss pass: only compare queries over the same table set — an
    # O(n^2) sweep over 292 skeletons is trivial, but same-table grouping
    # keeps the report about substitutable queries, not generic lookalikes
    by_tables: dict[tuple[str, ...], list[str]] = defaultdict(list)
    for name in skels:
        by_tables[tables_of(oracle_of(REGISTRY[name]))].append(name)
    flat_exact = {n for g in exact_groups for n in g}
    near = []
    for group in by_tables.values():
        for a, b in itertools.combinations(sorted(group), 2):
            if a in flat_exact and b in flat_exact:
                continue
            j = jaccard(shingles(skels[a]), shingles(skels[b]))
            if j >= args.near:
                near.append({"a": a, "b": b, "jaccard": round(j, 3)})
    near.sort(key=lambda d: -d["jaccard"])

    report = {
        "n_oracles": len(skels),
        "exact_skeleton_groups": exact_groups,
        "near_pairs": near,
        "near_threshold": args.near,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    print(f"oracles audited: {len(skels)}")
    if exact_groups:
        print(f"EXACT skeleton duplicates ({len(exact_groups)} groups):")
        for g in exact_groups:
            print("  " + " == ".join(g))
    else:
        print("EXACT skeleton duplicates: none")
    if near:
        print(f"near pairs (same tables, jaccard >= {args.near}):")
        for d in near:
            print(f"  {d['a']} ~ {d['b']}  ({d['jaccard']})")
    else:
        print(f"near pairs (jaccard >= {args.near}): none")


if __name__ == "__main__":
    main()
