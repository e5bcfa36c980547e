"""Generate docs/REGISTRY.md from the live QueryDef registry.

Round-7 verdict #8: SURVEY §2 inventories the reference's 70 operators,
but the registry carries 290+ entries (the beyond-§2 training-pipeline
surface: dedup, similarity, sketches, streaming, curation, ...). This
emits the single auditable index — id, one-line doc, source file:line,
oracle kind — mechanically from the registered callables, grouped by
defining module. tests/test_registry_hygiene.py regenerates and compares,
so the checked-in file cannot drift from the code.

Run: python tools/gen_registry_docs.py   (rewrites docs/REGISTRY.md)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "docs", "REGISTRY.md")


def _first_line(doc: str) -> str:
    line = (doc or "").strip().splitlines()
    return line[0].strip() if line else ""


def _site(fn) -> tuple[str, str]:
    """(module-relative path, 'file.py:line') of the registered callable."""
    code = fn.__code__
    rel = os.path.relpath(code.co_filename, REPO)
    return rel, f"{rel}:{code.co_firstlineno}"


def render() -> str:
    from ai_knowledge_etl_spark.registry import REGISTRY

    by_module: dict[str, list] = {}
    for q in REGISTRY.values():
        rel, site = _site(q.spark)
        by_module.setdefault(rel, []).append((q, site))

    n_sql = sum(1 for q in REGISTRY.values() if q.oracle or q.oracle_fn)
    lines = [
        "# Registry index (generated — do not edit)",
        "",
        "Regenerate with `python tools/gen_registry_docs.py`;",
        "`tests/test_registry_hygiene.py` pins this file to the code.",
        "",
        f"**{len(REGISTRY)} queries** — {n_sql} with a full DuckDB SQL",
        f"oracle (value-hash differential), {len(REGISTRY) - n_sql} with",
        "the weaker rows-only check (non-SQL-expressible: stateful",
        "streaming, iterative algorithms, binary/multimodal kernels).",
        "",
    ]
    for rel in sorted(by_module):
        entries = sorted(by_module[rel], key=lambda t: t[0].name)
        lines.append(f"## {rel} ({len(entries)})")
        lines.append("")
        lines.append("| id | oracle | source | doc |")
        lines.append("|---|---|---|---|")
        for q, site in entries:
            # oracle_kind (round-9 verdict #6): "replay" marks oracles
            # that predict the output (VALUES/arithmetic/trace-walk)
            # instead of recomputing it — equality proof, not an engine
            # ratio. BENCH_DETAIL carries the same tag per query.
            from ai_knowledge_etl_spark.registry import oracle_kind_of

            kind = ("sql" if q.oracle else "sql (lazy)" if q.oracle_fn else "rows-only")
            if oracle_kind_of(q) == "replay":
                kind += " · replay"
            doc = _first_line(q.doc).replace("|", "\\|")
            lines.append(f"| `{q.name}` | {kind} | {site} | {doc} |")
        lines.append("")
    return "\n".join(lines) + "\n"


def main() -> int:
    text = render()
    if len(sys.argv) > 1 and sys.argv[1] == "--check":
        with open(OUT) as f:
            if f.read() != text:
                print("docs/REGISTRY.md is stale — rerun "
                      "tools/gen_registry_docs.py", file=sys.stderr)
                return 1
        print("docs/REGISTRY.md is in sync")
        return 0
    with open(OUT, "w") as f:
        f.write(text)
    print(f"wrote {OUT} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
