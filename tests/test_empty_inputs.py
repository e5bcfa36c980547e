"""Degenerate-input hardening: EVERY registered query must execute against
zero-row tables without raising. Empty partitions are routine at 100 TB
(a filter that matches nothing, a new tenant, a fresh day); an operator
that assumes a non-empty table (first()/collect()[0]/driver-side scalar
branches) dies there first. Row counts are not asserted — only that the
whole registry survives execution."""

from __future__ import annotations

import os

import pytest

from ai_knowledge_etl_spark.registry import REGISTRY
from ai_knowledge_etl_spark.sources.catalog import TABLES, load_table


@pytest.fixture(scope="session")
def empty_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            load_table(spark, sf_dir, t).limit(0).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


def test_every_query_survives_empty_tables(spark, empty_dir):
    failures = {}
    for name in sorted(REGISTRY):
        try:
            REGISTRY[name].spark(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001 — we want the full census
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
    assert not failures, f"{len(failures)} queries die on empty input: {failures}"
