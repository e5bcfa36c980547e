"""Relevance scoring — the reference's signature scalar kernel, as pure
column expressions (reference: skills/relevance-scorer/SKILL.md:39-211,
config/limits.yaml:112-119).

Everything is `F.when` arithmetic + `least` caps: zero UDFs, fully
codegen'd, and identically expressible in ANSI SQL for the DuckDB oracle.
Topic patterns must use a capture group (regexp_extract_all counts group 1)
and stay in the Java-regex ∩ RE2 subset.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config


def _match(col: Column | str, topic_re: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(topic_re)


def mention_count(text: Column | str, topic_re: str) -> Column:
    """Number of topic matches in the text. `topic_re` must contain one
    capture group, e.g. ``"(spark|shuffle)"``."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(topic_re), 1))


def score_link(
    url: Column | str, anchor: Column | str, context: Column | str, topic_re: str
) -> Column:
    """Link relevance 0-10 (reference: skills/relevance-scorer/SKILL.md:92-119):
    +3 URL match, +5 anchor match, +2 context match, capped at 10."""
    s = (
        F.when(_match(url, topic_re), config.LINK_URL_WEIGHT).otherwise(0)
        + F.when(_match(anchor, topic_re), config.LINK_ANCHOR_WEIGHT).otherwise(0)
        + F.when(_match(context, topic_re), config.LINK_CONTEXT_WEIGHT).otherwise(0)
    )
    return F.least(s, F.lit(config.SCORE_CAP))


def density_bonus(text: Column | str, topic_re: str) -> Column:
    """Mention-density bonus (reference: skills/relevance-scorer/SKILL.md:123-155):
    >=10 mentions -> +3, >=5 -> +2, >=2 -> +1."""
    n = mention_count(text, topic_re)
    expr = F.lit(0)
    # build innermost-first: ascending thresholds so the highest tier ends up
    # as the outermost WHEN (n>=10 must not fall through to the n>=2 branch)
    for threshold, bonus in sorted(config.PAGE_DENSITY_TIERS):
        expr = F.when(n >= threshold, bonus).otherwise(expr)
    return expr


def score_page(
    title: Column | str, headings: Column | str, body: Column | str, topic_re: str
) -> Column:
    """Page relevance 0-10 (reference: skills/relevance-scorer/SKILL.md:69-86):
    +3 title match, +2 × min(heading matches, 2), + density bonus, capped 10.

    `headings` is the concatenated heading text (the fixture corpus has no
    markdown structure, so callers derive a deterministic headings surrogate,
    e.g. a text prefix)."""
    heading_matches = F.least(
        mention_count(headings, topic_re), F.lit(config.PAGE_HEADING_MAX)
    )
    s = (
        F.when(_match(title, topic_re), config.PAGE_TITLE_WEIGHT).otherwise(0)
        + heading_matches * config.PAGE_HEADING_WEIGHT
        + density_bonus(body, topic_re)
    )
    return F.least(s, F.lit(config.SCORE_CAP))


def priority(link_score: Column | str, parent_relevance: Column | str) -> Column:
    """Queue priority = link score + parent bonus (reference:
    skills/relevance-scorer/SKILL.md:193-211): +3 if parent >= 8, +1 if >= 5."""
    ls = F.col(link_score) if isinstance(link_score, str) else link_score
    pr = (
        F.col(parent_relevance)
        if isinstance(parent_relevance, str)
        else parent_relevance
    )
    bonus = (
        F.when(pr >= config.PARENT_BONUS_HIGH[0], config.PARENT_BONUS_HIGH[1])
        .when(pr >= config.PARENT_BONUS_MED[0], config.PARENT_BONUS_MED[1])
        .otherwise(0)
    )
    return ls + bonus


def traversal_action(score: Column | str) -> Column:
    """Band a score into a traversal action (reference:
    skills/relevance-scorer/SKILL.md:157-189): >=8 dfs_deep, 5-7 bfs, <5 prune."""
    s = F.col(score) if isinstance(score, str) else score
    return (
        F.when(s >= config.BAND_DFS_MIN, F.lit("dfs_deep"))
        .when(s >= config.BAND_BFS_MIN, F.lit("bfs"))
        .otherwise(F.lit("prune"))
    )


def stars(relevance: Column | str) -> Column:
    """Relevance 0-10 → 5-char star string, 5 bands (reference:
    crawler-summarizer.md:345-354)."""
    r = F.col(relevance) if isinstance(relevance, str) else relevance
    return (
        F.when(r >= 9, F.lit("*****"))
        .when(r >= 7, F.lit("****-"))
        .when(r >= 5, F.lit("***--"))
        .when(r >= 3, F.lit("**---"))
        .otherwise(F.lit("*----"))
    )
