"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The actual query definitions live in
``ai_knowledge_etl_spark/registry/`` — one QueryDef per operator from
SURVEY.md §2, each a DataFrame-API implementation plus a DuckDB SQL twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_knowledge_etl_spark.registry import REGISTRY, oracle_of  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the crawl INDEX report — relevance-score the
    corpus, band it, and aggregate page/char statistics (SURVEY §7 Phase 0).
    Exercises scan → project → regex score → conditional agg in one plan."""
    return REGISTRY["agg-index-stats"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.spark for name, qd in REGISTRY.items()}


ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver compares at sf=0.01


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin for every SQL-expressible query. The
    {SF_DIR} placeholder (filesystem-scan manifest oracles) is resolved to
    the driver's sf0.01 compare dir."""
    return {
        name: sql.replace("{SF_DIR}", ORACLE_SF_DIR)
        for name, qd in REGISTRY.items()
        if (sql := oracle_of(qd)) is not None
    }
