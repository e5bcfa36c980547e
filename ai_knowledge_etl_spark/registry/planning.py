"""Planner / strategy operators (SURVEY §2.K) — the control plane as data.

Thresholds here are scaled to the fixture corpus (n_chars ≤ ~1k; the
reference's real limits are in config.py) — the *shape* of the routing is
what's under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.plans import strategy
from ai_knowledge_etl_spark.registry import register
from ai_knowledge_etl_spark.sources.catalog import load_table

# fixture-scaled thresholds (reference semantics: DESIGN.md:647-724)
DIRECT_MAX, CHUNK_MAX = 300, 600
FTYPE_EXPR = (
    "CASE doc_id % 5 WHEN 0 THEN 'md' WHEN 1 THEN 'image' WHEN 2 THEN 'pdf'"
    " WHEN 3 THEN 'csv' ELSE 'bin' END"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "plan-assign-strategy",
    f"""
WITH tasks AS (SELECT doc_id, {FTYPE_EXPR} AS ftype, n_chars FROM documents)
SELECT doc_id, ftype,
       CASE WHEN ftype = 'bin' THEN 'REJECT'
            WHEN ftype = 'image' THEN 'COMPRESS'
            WHEN n_chars <= {DIRECT_MAX} THEN 'DIRECT'
            WHEN n_chars <= {CHUNK_MAX} THEN 'CHUNK'
            ELSE 'SUMMARY' END AS strategy
FROM tasks
""".strip(),
    doc="Per-task strategy from type+size thresholds "
    "(reference: DESIGN.md:647-724): DIRECT/COMPRESS/CHUNK/SUMMARY/REJECT.",
)
def q_plan_assign_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    tasks = _docs(spark, sf_dir).select(
        "doc_id", F.expr(FTYPE_EXPR).alias("ftype"), "n_chars"
    )
    return tasks.select(
        "doc_id",
        "ftype",
        strategy.assign_strategy("ftype", "n_chars", DIRECT_MAX, CHUNK_MAX).alias(
            "strategy"
        ),
    )


@register(
    "plan-fallback-chain",
    f"""
SELECT doc_id,
       CASE WHEN n_chars <= {DIRECT_MAX} THEN 'full'
            WHEN n_chars <= {2 * DIRECT_MAX} THEN 'truncate'
            WHEN n_chars <= {3 * DIRECT_MAX} THEN 'key_sections'
            ELSE 'headings_only' END AS level,
       CASE WHEN n_chars <= {DIRECT_MAX} THEN text
            WHEN n_chars <= {2 * DIRECT_MAX} THEN substring(text, 1, {DIRECT_MAX})
            WHEN n_chars <= {3 * DIRECT_MAX} THEN substring(text, 1, {DIRECT_MAX // 2})
            ELSE substring(text, 1, 60) END AS content
FROM documents
""".strip(),
    doc="Content fallback chain full → truncate → key_sections → "
    "headings_only as a coalesce of progressively cheaper projections "
    "(reference: content-safeguard/references/limits.yaml:31-54).",
)
def q_plan_fallback_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    level, content = strategy.content_fallback(
        "text", "n_chars", (DIRECT_MAX, 2 * DIRECT_MAX, 3 * DIRECT_MAX)
    )
    return _docs(spark, sf_dir).select(
        "doc_id", level.alias("level"), content.alias("content")
    )


@register(
    "plan-complexity-detect",
    """
SELECT doc_id,
       CASE WHEN n_chars < 200 THEN 'simple'
            WHEN n_chars > 600 OR lang = 'zh' THEN 'complex'
            ELSE 'medium' END AS complexity
FROM documents
""".strip(),
    doc="Input → simple/medium/complex plan shape "
    "(reference: commands/extract.md:193-203,954-1009).",
)
def q_plan_complexity_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", strategy.complexity("n_chars", "lang").alias("complexity")
    )
