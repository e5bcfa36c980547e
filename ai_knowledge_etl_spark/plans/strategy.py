"""Per-task strategy assignment + fallback chains
(reference: DESIGN.md:647-763, skills/content-safeguard).

The reference's planner picks DIRECT/COMPRESS/CHUNK/SUMMARY/SKIP/REJECT
from (type, size) thresholds, and degrades content through a fallback chain
(full → truncate → key_sections → headings_only). Both are adaptive routing
expressed as `when` chains — the analog of Catalyst physical strategy
selection, kept declarative so it folds into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config


def assign_strategy(
    ftype: Column | str,
    size: Column | str,
    direct_max: int = config.STRATEGY_DIRECT_MAX,
    chunk_max: int = config.STRATEGY_CHUNK_MAX,
) -> Column:
    """type+size → strategy (reference: DESIGN.md:647-724)."""
    t = F.col(ftype) if isinstance(ftype, str) else ftype
    s = F.col(size) if isinstance(size, str) else size
    return (
        F.when(t == "bin", F.lit("REJECT"))
        .when(t == "image", F.lit("COMPRESS"))
        .when(s <= direct_max, F.lit("DIRECT"))
        .when(s <= chunk_max, F.lit("CHUNK"))
        .otherwise(F.lit("SUMMARY"))
    )


def content_fallback(
    text: Column | str,
    size: Column | str,
    tiers: tuple[int, int, int] = (
        config.STRATEGY_DIRECT_MAX,
        2 * config.STRATEGY_DIRECT_MAX,
        3 * config.STRATEGY_DIRECT_MAX,
    ),
) -> tuple[Column, Column]:
    """Fallback chain full → truncate → key_sections → headings_only
    (reference: content-safeguard/references/limits.yaml:31-54). Returns
    (level, content) — a coalesce over progressively cheaper projections."""
    t = F.col(text) if isinstance(text, str) else text
    s = F.col(size) if isinstance(size, str) else size
    lo, mid, hi = tiers
    level = (
        F.when(s <= lo, F.lit("full"))
        .when(s <= mid, F.lit("truncate"))
        .when(s <= hi, F.lit("key_sections"))
        .otherwise(F.lit("headings_only"))
    )
    content = F.coalesce(
        F.when(s <= lo, t),
        F.when(s <= mid, F.substring(t, 1, lo)),
        F.when(s <= hi, F.substring(t, 1, lo // 2)),
        F.substring(t, 1, 60),
    )
    return level, content


def complexity(size: Column | str, lang: Column | str) -> Column:
    """Input → simple/medium/complex plan shape
    (reference: commands/extract.md:193-203,954-1009)."""
    s = F.col(size) if isinstance(size, str) else size
    lg = F.col(lang) if isinstance(lang, str) else lang
    return (
        F.when(s < 200, F.lit("simple"))
        .when((s > 600) | (lg == "zh"), F.lit("complex"))
        .otherwise(F.lit("medium"))
    )
