"""Crawl-domain operators (SURVEY §2.B/C/D + report aggregates).

Each query re-expresses a reference operator over the fixture corpus, with a
DuckDB oracle computing the identical result. The Spark side is pure
DataFrame API over the `functions/` kernels; the oracle re-states the same
formula in ANSI SQL with the same config constants interpolated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config
from ai_knowledge_etl_spark.functions import scoring, text, urls
from ai_knowledge_etl_spark.registry import register
from ai_knowledge_etl_spark.sources import synthetic as syn
from ai_knowledge_etl_spark.sources.catalog import load_table

T = syn.TOPIC_RE
ENTRY_DOMAIN = "src3.example.com"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _links(spark: SparkSession, sf_dir: str) -> DataFrame:
    return syn.with_links_columns(_docs(spark, sf_dir))


# --- shared formula fragments (SQL side) --------------------------------------

LINK_SCORE_SQL = f"""
CAST(least(
  CASE WHEN regexp_matches(url, '{T}') THEN {config.LINK_URL_WEIGHT} ELSE 0 END
  + CASE WHEN regexp_matches(anchor, '{T}') THEN {config.LINK_ANCHOR_WEIGHT} ELSE 0 END
  + CASE WHEN regexp_matches(context, '{T}') THEN {config.LINK_CONTEXT_WEIGHT} ELSE 0 END,
  {config.SCORE_CAP}) AS INTEGER)
""".strip()

_MENTIONS_SQL = f"len(regexp_extract_all(text, '{T}', 1))"
PAGE_SCORE_SQL = f"""
CAST(least(
  CASE WHEN regexp_matches(substring(text, 1, 60), '{T}') THEN {config.PAGE_TITLE_WEIGHT} ELSE 0 END
  + {config.PAGE_HEADING_WEIGHT} * least(len(regexp_extract_all(substring(text, 1, 200), '{T}', 1)), {config.PAGE_HEADING_MAX})
  + CASE WHEN {_MENTIONS_SQL} >= 10 THEN 3
         WHEN {_MENTIONS_SQL} >= 5 THEN 2
         WHEN {_MENTIONS_SQL} >= 2 THEN 1 ELSE 0 END,
  {config.SCORE_CAP}) AS INTEGER)
""".strip()

PAGES_CTE = f"""
pages AS (
  SELECT doc_id, {PAGE_SCORE_SQL} AS relevance, {syn.DEPTH_EXPR} AS depth, n_chars
  FROM documents
)
""".strip()


def _page_score_col() -> F.Column:
    return scoring.score_page(
        text.title_of("text", 60),
        F.substring("text", 1, 200),
        F.col("text"),
        T,
    )


def _link_score_col() -> F.Column:
    return scoring.score_link("url", "anchor", "context", T)


# --- §2.C scoring --------------------------------------------------------------


@register(
    "score-link",
    f"WITH {syn.LINKS_CTE}\n"
    f"SELECT doc_id, url, {LINK_SCORE_SQL} AS link_score FROM links",
    doc="Link relevance 0-10 (reference: skills/relevance-scorer/SKILL.md:92-119).",
)
def q_score_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _links(spark, sf_dir).select(
        "doc_id", "url", _link_score_col().alias("link_score")
    )


@register(
    "score-page",
    f"SELECT doc_id, {PAGE_SCORE_SQL} AS page_score FROM documents",
    doc="Page relevance 0-10 (reference: skills/relevance-scorer/SKILL.md:69-86).",
)
def q_score_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", _page_score_col().alias("page_score")
    )


@register(
    "score-priority",
    f"""
WITH {syn.LINKS_CTE},
pages AS (
  SELECT doc_id AS parent_key, {PAGE_SCORE_SQL} AS parent_relevance
  FROM documents WHERE doc_id < 50
)
SELECT l.doc_id, l.url, {LINK_SCORE_SQL} AS link_score, p.parent_relevance,
       CAST({LINK_SCORE_SQL}
            + CASE WHEN p.parent_relevance >= {config.PARENT_BONUS_HIGH[0]} THEN {config.PARENT_BONUS_HIGH[1]}
                   WHEN p.parent_relevance >= {config.PARENT_BONUS_MED[0]} THEN {config.PARENT_BONUS_MED[1]}
                   ELSE 0 END AS INTEGER) AS priority
FROM links l JOIN pages p ON l.parent_id = p.parent_key
""".strip(),
    doc="Queue priority = link score + parent bonus "
    "(reference: skills/relevance-scorer/SKILL.md:193-211). Broadcast join: "
    "the parent-page dimension is tiny relative to the link fan-out.",
)
def q_score_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = _links(spark, sf_dir).withColumn("link_score", _link_score_col())
    parents = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 50)
        .select(
            F.col("doc_id").alias("parent_key"),
            _page_score_col().alias("parent_relevance"),
        )
    )
    joined = links.join(
        F.broadcast(parents), links.parent_id == parents.parent_key
    )
    return joined.select(
        "doc_id",
        "url",
        "link_score",
        "parent_relevance",
        scoring.priority("link_score", "parent_relevance").alias("priority"),
    )


@register(
    "classify-traversal",
    f"""
WITH {PAGES_CTE}
SELECT doc_id, relevance AS page_score,
       CASE WHEN relevance >= {config.BAND_DFS_MIN} THEN 'dfs_deep'
            WHEN relevance >= {config.BAND_BFS_MIN} THEN 'bfs'
            ELSE 'prune' END AS action
FROM pages
""".strip(),
    doc="Score band → traversal action (reference: relevance-scorer SKILL.md:157-189).",
)
def q_classify_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _docs(spark, sf_dir).select(
        "doc_id", _page_score_col().alias("page_score")
    )
    return scored.withColumn(
        "action", scoring.traversal_action("page_score")
    )


_PRESET_VALUES = ",\n    ".join(
    f"('{k}', '{p}')" for k, p in config.TOPIC_PRESETS.items()
)


@register(
    "score-page-preset",
    f"""
WITH {syn.UNI_DOCS_CTE},
{syn.PRESET_DOCS_CTE},
presets(preset, pattern) AS (VALUES
    {_PRESET_VALUES}),
m AS (
  SELECT p.preset, d.doc_id,
         len(regexp_extract_all(lower(d.text), p.pattern, 1)) AS m
  FROM pdocs d, presets p
)
SELECT preset,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(m) AS BIGINT) AS sum_mentions,
       CAST(max(m) AS INTEGER) AS max_mentions
FROM m WHERE m > 0
GROUP BY preset
""".strip(),
    doc="The PRESET relevance-pattern catalog scoring the multibyte probe "
    "corpus (reference: skills/relevance-scorer/references/patterns.md:"
    "1-64 — the curated bilingual EN/中文 regex table per technology "
    "domain and doc type that a user reaching for --topic gets for "
    "free). config.TOPIC_PRESETS ships all eight presets in the "
    "Java∩RE2 subset; every doc in uni_docs gets one planted bilingual "
    "snippet (synthetic.PRESET_SNIPPETS, doc_id % 8), so each preset "
    "has true positives whose CJK alternations are load-bearing. Spark "
    "side evaluates the 8 literal patterns as codegen'd "
    "regexp_extract_all columns then explodes to long form — patterns "
    "stay foldable so each regex compiles once per task, linear scan, "
    "no shuffle before the 8-group aggregate. Counting (not boolean) "
    "matches makes the differential sensitive to engine regex-semantics "
    "drift (leftmost-first alternation in both Java and RE2).",
)
def q_score_page_preset(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = syn.preset_docs(_docs(spark, sf_dir))
    lowered = F.lower(F.col("text"))
    structs = [
        F.struct(
            F.lit(k).alias("preset"),
            F.size(F.regexp_extract_all(lowered, F.lit(p), F.lit(1))).alias(
                "m"
            ),
        )
        for k, p in config.TOPIC_PRESETS.items()
    ]
    long = docs.select(
        "doc_id", F.explode(F.array(*structs)).alias("s")
    ).select("doc_id", F.col("s.preset").alias("preset"), F.col("s.m").alias("m"))
    return (
        long.where(F.col("m") > 0)
        .groupBy("preset")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("m").cast("bigint").alias("sum_mentions"),
            F.max("m").cast("int").alias("max_mentions"),
        )
    )


# --- §2.B projections ----------------------------------------------------------


@register(
    "project-domain",
    f"WITH {syn.LINKS_CTE}\n"
    f"SELECT doc_id, url, regexp_extract(url, '{urls.DOMAIN_RE}', 1) AS domain FROM links",
    doc="Host extraction (reference: scripts/crawler-queue.sh:180-184).",
)
def q_project_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _links(spark, sf_dir).select(
        "doc_id", "url", urls.domain("url").alias("domain")
    )


@register(
    "project-url-normalize",
    f"WITH {syn.LINKS_CTE}\n"
    "SELECT doc_id, url,"
    " regexp_replace(regexp_replace(url, '#.*$', ''), '/$', '') AS url_norm FROM links",
    doc="Strip fragment + trailing slash (reference: crawler-queue.sh:220-228).",
)
def q_project_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _links(spark, sf_dir).select(
        "doc_id", "url", urls.normalize("url").alias("url_norm")
    )


@register(
    "project-url-slug",
    f"WITH {syn.LINKS_CTE}\n"
    "SELECT doc_id,"
    " substring(regexp_replace(regexp_replace(url, 'https?://', ''),"
    " '[^a-zA-Z0-9]', '_', 'g'), 1, 50) AS slug FROM links",
    doc="URL → safe filename (reference: scripts/extract-jina.sh:54). "
    "DuckDB needs the 'g' flag for the global replace Spark does by default.",
)
def q_project_url_slug(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _links(spark, sf_dir).select(
        "doc_id", urls.slug("url").alias("slug")
    )


@register(
    "project-stars",
    f"""
WITH {PAGES_CTE}
SELECT doc_id, relevance,
       CASE WHEN relevance >= 9 THEN '*****'
            WHEN relevance >= 7 THEN '****-'
            WHEN relevance >= 5 THEN '***--'
            WHEN relevance >= 3 THEN '**---'
            ELSE '*----' END AS stars
FROM pages
""".strip(),
    doc="Relevance → star band string (reference: crawler-summarizer.md:345-354).",
)
def q_project_stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _docs(spark, sf_dir).select(
        "doc_id", _page_score_col().alias("relevance")
    )
    return scored.withColumn("stars", scoring.stars("relevance"))


@register(
    "project-content-flags",
    f"""
WITH probed AS (SELECT doc_id, {syn.FLAG_TEXT_EXPR} AS ptext FROM documents)
SELECT doc_id,
       regexp_matches(ptext, '```') AS has_code,
       regexp_matches(ptext, '\\|.*\\|') AS has_tables
FROM probed
""".strip(),
    doc="hasCode / hasTables flags (reference: DESIGN.md:1293-1298).",
)
def q_project_content_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    probed = _docs(spark, sf_dir).select(
        "doc_id", F.expr(syn.FLAG_TEXT_EXPR).alias("ptext")
    )
    return probed.select(
        "doc_id",
        text.has_code("ptext").alias("has_code"),
        text.has_table("ptext").alias("has_tables"),
    )


@register(
    "project-truncate-notice",
    "SELECT doc_id, CASE WHEN length(text) > 300"
    f" THEN substring(text, 1, 300) || '{config.TRUNCATE_NOTICE}'"
    " ELSE text END AS out_text FROM documents",
    doc="Truncate with visible notice (reference: DESIGN.md:983-996, "
    "content-safeguard SKILL.md:130-137).",
)
def q_project_truncate_notice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        text.truncate_with_notice("text", 300).alias("out_text"),
    )


# --- §2.B filters / predicates --------------------------------------------------


@register(
    "filter-url-skip",
    f"""
WITH {syn.LINKS_CTE}
SELECT doc_id, url FROM links
WHERE NOT regexp_matches(lower(url), '{config.URL_SKIP_EXT_RE}')
  AND NOT regexp_matches(lower(url), '{config.URL_SKIP_PATH_RE}')
""".strip(),
    doc="Drop never-fetch URLs by extension/path pattern "
    "(reference: scripts/crawler-queue.sh:199-218). Applied to the frontier "
    "BEFORE the fetch stage — the reference's predicate-pushdown-across-fetch.",
)
def q_filter_url_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _links(spark, sf_dir)
        .where(~urls.is_skippable("url"))
        .select("doc_id", "url")
    )


_ROBOTS_CTE = """
robots AS (
  SELECT DISTINCT source || '.example.com' AS rdomain, seg
  FROM documents
  CROSS JOIN (SELECT unnest(['cart', 'login', 'search']) AS seg)
)
""".strip()


@register(
    "filter-robots-disallow",
    f"""
WITH {syn.LINKS_CTE}, {_ROBOTS_CTE},
cand AS (
  SELECT doc_id, url,
         regexp_extract(url, 'https?://([^/]+)', 1) AS rdomain,
         regexp_extract(url, 'https?://[^/]+/([^/]+)', 1) AS seg
  FROM links
)
SELECT c.doc_id, c.url FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM robots r
  WHERE r.rdomain = c.rdomain AND r.seg = c.seg
)
""".strip(),
    doc="robots.txt-style disallow filter: per-domain DIRECTORY rules "
    "anti-joined against the frontier on (domain, first path segment) — "
    "a pure equi key, so the plan is a broadcast hash LEFT ANTI join "
    "(plan-tested), never a nested loop; at 10^9 frontier URLs the rules "
    "side (domains × few directories) still broadcasts. Directory-segment "
    "equality rather than raw prefix matching is deliberate: it keeps the "
    "join equi (prefix rules would force a nested-loop or a per-rule "
    "rewrite) and matches how disallow rules are overwhelmingly written. "
    "Crawl-politeness complement of filter-url-skip's global patterns.",
)
def q_filter_robots_disallow(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = _links(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    rules = (
        docs.select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("rdomain")
        )
        .distinct()
        .select(
            "rdomain",
            F.explode(
                F.array(F.lit("cart"), F.lit("login"), F.lit("search"))
            ).alias("seg"),
        )
    )
    cand = links.select(
        "doc_id",
        "url",
        urls.domain("url").alias("rdomain"),
        F.regexp_extract(F.col("url"), r"https?://[^/]+/([^/]+)", 1).alias(
            "seg"
        ),
    )
    kept = cand.join(F.broadcast(rules), ["rdomain", "seg"], "left_anti")
    return kept.select("doc_id", "url")


@register(
    "filter-same-domain",
    f"""
WITH {syn.LINKS_CTE}
SELECT doc_id, url FROM links
WHERE regexp_extract(url, '{urls.DOMAIN_RE}', 1) = '{ENTRY_DOMAIN}'
""".strip(),
    doc="same_domain_only filter (reference: scripts/crawler-queue.sh:186-197).",
)
def q_filter_same_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _links(spark, sf_dir)
        .where(urls.same_domain("url", ENTRY_DOMAIN))
        .select("doc_id", "url")
    )


@register(
    "filter-relevance-threshold",
    f"""
WITH {syn.LINKS_CTE}
SELECT doc_id, url, {LINK_SCORE_SQL} AS link_score, CAST({syn.DEPTH_EXPR} AS INTEGER) AS depth
FROM links
WHERE {LINK_SCORE_SQL} >= {config.SKIP_THRESHOLD} AND {syn.DEPTH_EXPR} <= {config.MAX_DEPTH}
""".strip(),
    doc="Enqueue gate: score >= skip_threshold and depth cap "
    "(reference: commands/extract.md:803-805, config/limits.yaml:117-119).",
)
def q_filter_relevance_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = _links(spark, sf_dir).select(
        "doc_id",
        "url",
        _link_score_col().alias("link_score"),
        F.expr(syn.DEPTH_EXPR).cast("int").alias("depth"),
    )
    return links.where(
        (F.col("link_score") >= config.SKIP_THRESHOLD)
        & (F.col("depth") <= config.MAX_DEPTH)
    )


@register(
    "filter-security-route",
    f"""
WITH routed AS (SELECT doc_id, {syn.ROUTED_URL_EXPR} AS url FROM documents)
SELECT doc_id, url,
       CASE WHEN regexp_matches(lower(url), '{config.PRIVATE_IP_RE}') THEN 'local'
            WHEN regexp_matches(lower(url), '{config.INTERNAL_DOMAIN_RE}') THEN 'local'
            WHEN regexp_matches(lower(url), '{config.SENSITIVE_KEYWORD_RE}') THEN 'local'
            ELSE 'external' END AS engine
FROM routed
""".strip(),
    doc="Security routing url → engine (reference: commands/extract.md:92-155, "
    "config/security.yaml:17-104).",
)
def q_filter_security_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = _docs(spark, sf_dir).select(
        "doc_id", syn.routed_url_col().alias("url")
    )
    return routed.withColumn("engine", urls.security_route("url"))


@register(
    "predicate-obstacle-detect",
    f"""
WITH probed AS (SELECT doc_id, {syn.OBSTACLE_TEXT_EXPR} AS ptext FROM documents)
SELECT doc_id,
       CASE WHEN length(trim(ptext)) < {config.OBSTACLE_MIN_CHARS} THEN 'ANTI_SCRAPE'
            WHEN regexp_matches(lower(ptext), '{config.OBSTACLE_LOGIN_RE}') THEN 'LOGIN_REQUIRED'
            WHEN regexp_matches(lower(ptext), '{config.OBSTACLE_CAPTCHA_RE}') THEN 'CAPTCHA'
            WHEN regexp_matches(lower(ptext), '{config.OBSTACLE_ANTIBOT_RE}') THEN 'ANTI_BOT'
            ELSE 'NONE' END AS obstacle
FROM probed
""".strip(),
    doc="Obstacle classification as data, never exceptions "
    "(reference: DESIGN.md:798-852).",
)
def q_predicate_obstacle_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    probed = _docs(spark, sf_dir).select(
        "doc_id", F.expr(syn.OBSTACLE_TEXT_EXPR).alias("ptext")
    )
    return probed.select(
        "doc_id", text.obstacle_type("ptext").alias("obstacle")
    )


@register(
    "filter-image-valuable",
    f"""
WITH {syn.IMAGES_CTE},
kept AS (
  SELECT page_id, img_id, img_index, w, h, src FROM images
  WHERE w >= {config.IMAGE_MIN_WIDTH} AND h >= {config.IMAGE_MIN_HEIGHT}
    AND NOT regexp_matches(lower(src), '{config.IMAGE_SKIP_RE}')
    AND NOT regexp_matches(lower(alt), '{config.IMAGE_SKIP_RE}')
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY page_id
                               ORDER BY img_index ASC, img_id ASC) AS rn
  FROM kept
)
SELECT page_id, img_id, img_index, w, h FROM ranked
WHERE rn <= {config.IMAGES_PER_PAGE_CAP}
""".strip(),
    doc="Keep only valuable images: ≥100×100 px, src/alt clear of the "
    "icon/logo/avatar skip patterns, ≤5 per page "
    "(reference: commands/extract.md:474-489, config/limits.yaml:56-74).",
)
def q_filter_image_valuable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import topk as TK

    images = syn.images_from_part(load_table(spark, sf_dir, "part"))
    kept = images.where(
        (F.col("w") >= config.IMAGE_MIN_WIDTH)
        & (F.col("h") >= config.IMAGE_MIN_HEIGHT)
        & ~F.lower(F.col("src")).rlike(config.IMAGE_SKIP_RE)
        & ~F.lower(F.col("alt")).rlike(config.IMAGE_SKIP_RE)
    ).select("page_id", "img_id", "img_index", "w", "h")
    return TK.top_k_per_group(
        kept,
        ["page_id"],
        config.IMAGES_PER_PAGE_CAP,
        F.asc("img_index"),
        F.asc("img_id"),
    )


# --- §2.D joins ------------------------------------------------------------------


@register(
    "join-links-parent",
    f"""
WITH {syn.LINKS_CTE},
pages AS (
  SELECT doc_id AS parent_key, {PAGE_SCORE_SQL} AS parent_relevance
  FROM documents WHERE doc_id < 50
)
SELECT l.doc_id, l.parent_id, p.parent_relevance
FROM links l JOIN pages p ON l.parent_id = p.parent_key
""".strip(),
    doc="Link → parent-page relevance equi join, broadcast "
    "(reference: crawler-coordinator.md:136-141,253-263).",
)
def q_join_links_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = _links(spark, sf_dir)
    parents = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 50)
        .select(
            F.col("doc_id").alias("parent_key"),
            _page_score_col().alias("parent_relevance"),
        )
    )
    return links.join(
        F.broadcast(parents), links.parent_id == parents.parent_key
    ).select("doc_id", "parent_id", "parent_relevance")


@register(
    "join-frontier-visited",
    f"""
WITH {syn.LINKS_CTE}, {syn.VISITED_CTE},
cand AS (SELECT regexp_replace(regexp_replace(url, '#.*$', ''), '/$', '') AS url FROM links),
vis AS (SELECT regexp_replace(regexp_replace(url, '#.*$', ''), '/$', '') AS url FROM visited)
SELECT url FROM cand WHERE url NOT IN (SELECT url FROM vis)
""".strip(),
    doc="Frontier minus visited: left_anti on normalized URL "
    "(reference: crawler-coordinator.md:202-203, crawler-queue.sh:36-41).",
)
def q_join_frontier_visited(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    cand = syn.with_links_columns(docs).select(
        urls.normalize("url").alias("url")
    )
    vis = syn.visited_urls(docs).select(urls.normalize("url").alias("url"))
    return cand.join(vis, "url", "left_anti")


@register(
    "dedup-visited",
    f"""
WITH {syn.LINKS_CTE}, {syn.VISITED_CTE}
SELECT url FROM links
EXCEPT ALL
SELECT url FROM visited
""".strip(),
    doc="Set difference frontier ∖ visited via exceptAll "
    "(reference: crawler-coordinator.md:202-203).",
)
def q_dedup_visited(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        syn.with_links_columns(docs)
        .select("url")
        .exceptAll(syn.visited_urls(docs))
    )


# --- §2.F top-k + §2.E report aggregate -----------------------------------------


@register(
    "topk-pages-report",
    f"""
WITH {PAGES_CTE}
SELECT doc_id, relevance FROM pages
ORDER BY relevance DESC, doc_id ASC
LIMIT 10
""".strip(),
    doc="REPORT top-10 pages by relevance (reference: "
    "crawler-summarizer.md:101-104). Spark plans TakeOrderedAndProject — "
    "no full sort at scale. doc_id tiebreak keeps the limit deterministic.",
)
def q_topk_pages_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _docs(spark, sf_dir).select(
        "doc_id", _page_score_col().alias("relevance")
    )
    return scored.orderBy(
        F.desc("relevance"), F.asc("doc_id")
    ).limit(10)


@register(
    "agg-index-stats",
    f"""
WITH {PAGES_CTE}
SELECT CAST(count(*) AS BIGINT) AS page_count,
       CAST(max(depth) AS BIGINT) AS max_depth,
       CAST(sum(CASE WHEN relevance >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS high_pages,
       CAST(sum(CASE WHEN relevance >= 5 AND relevance < 8 THEN 1 ELSE 0 END) AS BIGINT) AS medium_pages,
       CAST(sum(CASE WHEN relevance < 5 THEN 1 ELSE 0 END) AS BIGINT) AS low_pages,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM pages
""".strip(),
    doc="INDEX.md stats: count, max depth, conditional band counts, total "
    "chars (reference: crawler-summarizer.md:202-209). Single hash aggregate; "
    "Catalyst splits partial/final automatically.",
)
def q_agg_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _docs(spark, sf_dir).select(
        _page_score_col().alias("relevance"),
        F.expr(syn.DEPTH_EXPR).alias("depth"),
        "n_chars",
    )
    r = F.col("relevance")
    return pages.agg(
        F.count("*").alias("page_count"),
        F.max("depth").cast("bigint").alias("max_depth"),
        F.sum(F.when(r >= 8, 1).otherwise(0)).alias("high_pages"),
        F.sum(F.when((r >= 5) & (r < 8), 1).otherwise(0)).alias("medium_pages"),
        F.sum(F.when(r < 5, 1).otherwise(0)).alias("low_pages"),
        F.sum("n_chars").alias("total_chars"),
    )


# --- iterative link-graph ranking -----------------------------------------------


@register(
    "rank-pages-iterative",
    f"""
WITH {syn.LINKS_CTE},
e AS (
  SELECT parent_id AS src, doc_id AS dst FROM links WHERE parent_id <> doc_id
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM documents),
pr0 AS (
  SELECT doc_id AS node, CAST(1.0 AS DOUBLE) / (SELECT cnt FROM n) AS pr
  FROM documents
),
c1 AS (
  SELECT e.dst AS node, sum(CAST(p.pr / deg.d AS DECIMAL(28,18))) AS s
  FROM e JOIN pr0 p ON e.src = p.node JOIN deg ON e.src = deg.src
  GROUP BY e.dst
),
pr1 AS (
  SELECT p.node,
         CAST(0.15 AS DOUBLE) / (SELECT cnt FROM n)
           + CAST(0.85 AS DOUBLE) * CAST(coalesce(c1.s, 0) AS DOUBLE) AS pr
  FROM pr0 p LEFT JOIN c1 ON p.node = c1.node
),
c2 AS (
  SELECT e.dst AS node, sum(CAST(p.pr / deg.d AS DECIMAL(28,18))) AS s
  FROM e JOIN pr1 p ON e.src = p.node JOIN deg ON e.src = deg.src
  GROUP BY e.dst
),
pr2 AS (
  SELECT p.node,
         CAST(0.15 AS DOUBLE) / (SELECT cnt FROM n)
           + CAST(0.85 AS DOUBLE) * CAST(coalesce(c2.s, 0) AS DOUBLE) AS pr
  FROM pr1 p LEFT JOIN c2 ON p.node = c2.node
)
SELECT node AS doc_id, round(pr, 12) AS pagerank FROM pr2
""".strip(),
    doc="PageRank over the crawl link graph, two power iterations "
    "(operators/graph.py): per iteration two equi-joins + one groupBy — "
    "the principled version of the reference's heuristic link scoring "
    "(crawler-coordinator.md links/*.json). Mass sums reduce in "
    "DECIMAL(28,18), so the cross-engine diff is exact despite different "
    "shuffle orders; dangling mass drops identically on both sides.",
)
def q_rank_pages_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import graph

    docs = _docs(spark, sf_dir)
    links = _links(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").alias("node"))
    edges = links.where(F.col("parent_id") != F.col("doc_id")).select(
        F.col("parent_id").alias("src"), F.col("doc_id").alias("dst")
    )
    n = docs.count()
    if n == 0:  # empty corpus: no pages to rank (1/N teleport undefined)
        return docs.select(
            F.col("doc_id"), F.lit(0.0).alias("pagerank")
        )
    pr = graph.pagerank(nodes, edges, n_nodes=n, n_iter=2)
    return pr.select(
        F.col("node").alias("doc_id"), F.round("pr", 12).alias("pagerank")
    )


@register(
    "join-triangle-count",
    f"""
WITH {syn.LINKS_CTE},
e AS (
  SELECT parent_id AS src, doc_id AS dst FROM links WHERE parent_id <> doc_id
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
  GROUP BY v
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS t
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
wd AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
SELECT t AS n_triangles, n_wedges,
       3.0 * t / greatest(n_wedges, 1) AS global_clustering
FROM tri, wd
""".strip(),
    doc="Triangle census of the crawl link graph: n_triangles, n_wedges, "
    "global clustering coefficient (the link-neighborhood cohesion signal "
    "next to rank-pages-iterative; reference keeps links/*.json, "
    "crawler-coordinator.md). Spark side uses the degree-ordered "
    "enumeration (operators/graph.triangle_stats) whose join fan-out is "
    "bounded by graph degeneracy — skew-proof where the oracle's naive "
    "3-way self-join is not; both count each triangle exactly once, so "
    "parity checks the optimization.",
)
def q_join_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import graph

    edges = _links(spark, sf_dir).select(
        F.col("parent_id").alias("src"), F.col("doc_id").alias("dst")
    )
    return graph.triangle_stats(edges)


@register(
    "rank-hits-authority",
    f"""
WITH {syn.LINKS_CTE},
e AS (
  SELECT parent_id AS src, doc_id AS dst FROM links WHERE parent_id <> doc_id
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
a1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY dst),
h1 AS (
  SELECT e.src AS node, CAST(sum(a1.a) AS BIGINT) AS h
  FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src
),
a2 AS (
  SELECT e.dst AS node, CAST(sum(h1.h) AS BIGINT) AS a
  FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst
),
h2 AS (
  SELECT e.src AS node, CAST(sum(a2.a) AS BIGINT) AS h
  FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src
)
SELECT node, CAST(coalesce(a2.a, 0) AS BIGINT) AS authority,
       CAST(coalesce(h2.h, 0) AS BIGINT) AS hub
FROM nodes LEFT JOIN a2 USING (node) LEFT JOIN h2 USING (node)
""".strip(),
    doc="HITS hubs & authorities over the crawl link graph "
    "(operators/graph.hits_scores; Kleinberg's algorithm, public) — the "
    "complementary signal to rank-pages-iterative: a page can be a weak "
    "authority but a strong HUB (links to many authorities), which is "
    "exactly what a crawl frontier prioritizer wants to expand next. "
    "Two unnormalized power rounds; normalization rescales uniformly "
    "per round, so ranking is invariant and every score stays an exact "
    "BIGINT — no float drift between engines. Per round two equi-joins "
    "+ two hash aggregates on the edge list, linear in |E|.",
)
def q_rank_hits_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import graph

    edges = _links(spark, sf_dir).where(
        F.col("parent_id") != F.col("doc_id")
    ).select(F.col("parent_id").alias("src"), F.col("doc_id").alias("dst"))
    return graph.hits_scores(edges, n_iter=2)
