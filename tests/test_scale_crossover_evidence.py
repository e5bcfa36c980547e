"""Pins for the committed scale-crossover evidence (r9 verdict #1/#2).

docs/scale_crossover.json is the driver-visible adjudication for every
query that has ever read >2x DuckDB at sf0.1 with real oracle work —
bench.py embeds it into BENCH_DETAIL.scale_crossover verbatim. These
pins keep the artifact well-formed and anchored to the registry, so a
rename or a schema drift can't silently detach the evidence from the
queries it adjudicates.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "docs", "scale_crossover.json")

# every query that has ever sat near the 2x line with duck >= 0.5 s of
# real work must keep committed crossover evidence
WATCH_LIST = {
    "dedup-cluster-cc",
    "pipeline-warc-corpus",
    "pipeline-training-set",
    "agg-mad-outliers",
}


def test_evidence_schema_and_watch_list():
    with open(PATH) as f:
        ev = json.load(f)
    assert WATCH_LIST <= set(ev), sorted(WATCH_LIST - set(ev))
    for name, e in ev.items():
        assert e["mult"] >= 10, name
        assert e["entities"] == "distinct", name  # no replica artifacts
        assert e["spark"] == min(e["spark_walls"]), name
        assert e["duck"] == min(e["duck_walls"]), name
        assert e["ratio"] == round(e["spark"] / e["duck"], 3), name


def test_evidence_names_are_registered_sql_oracles():
    from ai_knowledge_etl_spark.registry import (
        REGISTRY,
        oracle_kind_of,
    )

    with open(PATH) as f:
        ev = json.load(f)
    for name in ev:
        assert name in REGISTRY, name
        # a replay oracle's duck wall is ~0 by design — crossover ratios
        # only mean something for recomputing (sql-kind) oracles
        assert oracle_kind_of(REGISTRY[name]) == "sql", name
