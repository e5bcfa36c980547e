"""Differential tests: every registered query vs its DuckDB oracle.

This is the same comparison the driver harness runs at sf0.01
(row count + column names + order-insensitive values), run at sf0.001 so the
suite stays fast. Rows-only queries (no oracle) just assert they execute and
return a stable schema.
"""

from __future__ import annotations

import pytest

from ai_knowledge_etl_spark.registry import REGISTRY
from tools.difftest import run_one


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, duck, sf_dir, name):
    ok, msg = run_one(spark, duck, name, sf_dir)
    assert ok, f"{name}: {msg}"
