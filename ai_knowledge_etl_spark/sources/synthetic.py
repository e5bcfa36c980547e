"""Deterministic crawl-shaped derivations over the fixture corpus.

The fixture `documents` table stands in for the reference's `pages/*.md`
corpus, but the crawl operators (reference: crawler-coordinator.md:128-176,
scripts/crawler-queue.sh) need URLs, anchors, link edges, a visited set, and
image metadata. We derive them deterministically from fixture columns.

CRITICAL INVARIANT: every expression here is written in the *dialect-common*
SQL subset parsed identically by Spark SQL (`F.expr`) and DuckDB, so the
driver's differential oracle evaluates the byte-identical derivation. Stick
to: CASE WHEN, `%`, `||`, CAST(x AS STRING), lower/replace/substring/length,
regexp_extract(s, pat, group) (returns '' on no match in both engines).
Avoid: rlike/regexp_matches (names differ), regexp_replace (global in Spark,
first-match in DuckDB), split (names differ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Topic used by every scoring query. One capture group (regexp_extract_all
# counts group 1 in both engines). The fixture text is an engine-vocabulary
# word stream, so these words actually occur.
TOPIC_RE = "(spark|shuffle|join)"

# --- URL from (source, doc_id) ------------------------------------------------
# Mix of path classes and extensions so skip-filters, normalization, routing
# and domain extraction all have positive + negative cases. Every 17th-ish
# doc (doc_id % 17 = 12) carries a multibyte CJK+emoji path segment — real
# crawls see IRI paths, and the slug/normalize/anchor ops must treat them
# as characters, not bytes (round-3 verdict #1).
URL_EXPR = """
'https://' || source || '.example.com' ||
CASE doc_id % 10
  WHEN 0 THEN '/docs' WHEN 1 THEN '/blog' WHEN 2 THEN '/login'
  WHEN 3 THEN '/cart' WHEN 4 THEN '/static/css' WHEN 5 THEN '/spark-tuning'
  WHEN 6 THEN '/join-guide' WHEN 7 THEN '/about' WHEN 8 THEN '/search'
  ELSE '/products' END ||
CASE WHEN doc_id % 17 = 12 THEN '/文档ページ🚀' ELSE '' END ||
'/item' || CAST(doc_id AS STRING) ||
CASE doc_id % 7
  WHEN 0 THEN '.html' WHEN 1 THEN '.pdf' WHEN 2 THEN '.zip'
  WHEN 3 THEN '' WHEN 4 THEN '.png' WHEN 5 THEN '.css' ELSE '' END ||
CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
CASE WHEN doc_id % 3 = 0 THEN '#section' ELSE '' END
""".strip()

# Sprinkle sensitive/internal cases for security routing.
ROUTED_URL_EXPR = f"""
CASE doc_id % 11
  WHEN 0 THEN 'https://wiki.corp.example/page' || CAST(doc_id AS STRING)
  WHEN 1 THEN 'http://192.168.1.' || CAST(doc_id % 250 AS STRING) || '/admin'
  WHEN 2 THEN 'https://api.example.com/data?token=abc' || CAST(doc_id AS STRING)
  ELSE ({URL_EXPR})
END
""".strip()

ANCHOR_EXPR = "substring(text, 1, 40)"
CONTEXT_EXPR = "substring(text, 1, 120)"
PARENT_ID_EXPR = "doc_id % 50"

# DuckDB CTE bodies reused by oracle queries. `links` is the edge table the
# reference keeps in links/*.json (crawler-coordinator.md:161-176); `visited`
# is the visited set (crawler-queue.sh:115-176).
LINKS_CTE = f"""
links AS (
  SELECT doc_id,
         {PARENT_ID_EXPR} AS parent_id,
         {URL_EXPR} AS url,
         {ANCHOR_EXPR} AS anchor,
         {CONTEXT_EXPR} AS context,
         text
  FROM documents
)
""".strip()

VISITED_CTE = f"""
visited AS (
  SELECT {URL_EXPR} AS url
  FROM documents WHERE doc_id % 4 = 0
)
""".strip()

# Image metadata derived from `part` — stands in for images.json
# (reference: commands/extract.md:470-546): index/alt/w/h plus skip-pattern
# positives (icon_/logo_ prefixes).
IMAGES_CTE = """
images AS (
  SELECT p_partkey AS img_id,
         p_partkey % 20 AS page_id,
         p_partkey % 8 AS img_index,
         p_size * 9 AS w,
         p_size * 6 AS h,
         'https://cdn.example.com/img/' ||
           CASE p_partkey % 6 WHEN 0 THEN 'icon_' WHEN 1 THEN 'logo_' ELSE '' END ||
           replace(lower(p_name), ' ', '_') || '.png' AS src,
         p_name AS alt
  FROM part
)
""".strip()


# Text probes injecting positive cases for flag/obstacle operators (the raw
# fixture corpus is a plain word stream with no markdown or login pages).
FLAG_TEXT_EXPR = (
    "text || CASE doc_id % 9 WHEN 0 THEN ' ```x = 1``` ' "
    "WHEN 1 THEN ' |col a|col b| ' ELSE '' END"
)
OBSTACLE_TEXT_EXPR = (
    "CASE doc_id % 13 "
    "WHEN 0 THEN 'please log in to continue' "
    "WHEN 1 THEN 'captcha verification required' "
    "WHEN 2 THEN 'checking cloudflare protection' "
    "WHEN 3 THEN substring(text, 1, 50) "
    "ELSE text END"
)

# depth surrogate for crawl operators (reference queue items carry depth 0-3)
DEPTH_EXPR = "doc_id % 4"

# --- multibyte / unicode probe corpus -----------------------------------------
# The fixture corpus is pure ASCII, which makes every byte-vs-character
# confusion invisible to the differential oracle (round-3 verdict #1). These
# decorations weave CJK (3-byte UTF-8), non-BMP emoji (4-byte, a surrogate
# PAIR in Java/UTF-16), and combining marks (é as e + U+0301) into derived
# clone documents. The multibyte chars are UTF-8 literals shared verbatim by
# both dialects — `chr(cp)` is NOT dialect-common above 255 (Spark's chr is
# byte-only, DuckDB's is codepoint). Branch %3==1 places chars 39-41 of the
# text as emoji/CJK so any 40-character head cut (WARC head, ANCHOR_EXPR)
# lands ON a multibyte boundary. Verified parity primitives (same result in
# Spark and DuckDB on this text): length/substring (codepoints), md5 (UTF-8
# bytes), upper/lower, replace, regexp_replace (Java regex is
# supplementary-codepoint-aware), split, lpad, trim. NOT parity-safe (avoid
# in oracled paths): reverse (DuckDB reverses graphemes, Spark codepoints),
# lower('İ') (Spark keeps the combining dot), octet_length (DuckDB needs a
# blob).
UNI_TEXT_EXPR = (
    "CASE doc_id % 3"
    " WHEN 0 THEN '漢字テスト🚀 日本語の文書です ' || text"
    " WHEN 1 THEN substring(text, 1, 38) || '🚀🌍字 émoji café́ '"
    "   || substring(text, 39, length(text))"
    " ELSE 'naïve cœur größe 🎄🧪 ' || text END"
)

# Clone id offset: +10M (near-dup clones) and +20M (exact clones) are taken
# by the dedup fixtures; unicode clones live at +30M. 30M ≡ 0 (mod 3) keeps
# the %3 branch alignment of derived probes identical for base and clone.
UNI_CLONE_OFFSET = 30000000

# doc_id % 10 < 3 → 30% of the corpus gets a multibyte clone.
UNI_CLONE_PRED = "doc_id % 10 < 3"

UNI_DOCS_CTE = f"""
udocs AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + {UNI_CLONE_OFFSET} AS doc_id, ut AS text, lang, source,
         CAST(length(ut) AS BIGINT) AS n_chars
  FROM (SELECT doc_id, ({UNI_TEXT_EXPR}) AS ut, lang, source
        FROM documents WHERE {UNI_CLONE_PRED})
)
""".strip()

# Bilingual probe snippets for the preset relevance-pattern catalog
# (config.TOPIC_PRESETS; reference:
# skills/relevance-scorer/references/patterns.md:1-64): snippet i carries
# one English AND one 中文 term of preset i (catalog order), chosen to be
# unique to that preset, so "preset i matches its own planted docs" is a
# true-positive assertion and the CJK alternations are load-bearing.
PRESET_SNIPPETS = [
    " oauth 认证 endpoint",        # api-development
    " react 组件 css",             # frontend
    " nosql 数据库 缓存",           # backend
    " docker 容器 部署",            # devops
    " owasp 漏洞 加密",             # security
    " quick start 入门 教程",       # getting-started
    " specification 规范 参考",     # reference-docs
    " demo 示例 cookbook",          # examples
]

_PRESET_CASE = " ".join(
    f"WHEN {i} THEN '{s}'" for i, s in enumerate(PRESET_SNIPPETS)
)
# Every doc gets exactly one preset snippet (doc_id % 8 picks it), appended
# to the multibyte uni text — so each preset has ~1/8 of the corpus as
# planted bilingual probes, in both engines from this one expression.
PRESET_TEXT_EXPR = f"text || CASE doc_id % 8 {_PRESET_CASE} END"

PRESET_DOCS_CTE = f"""
pdocs AS (
  SELECT doc_id, ({PRESET_TEXT_EXPR}) AS text, lang, source FROM udocs
)
""".strip()


def preset_docs(documents: DataFrame) -> DataFrame:
    """Spark twin of PRESET_DOCS_CTE over uni_docs: the multibyte corpus
    with one bilingual preset snippet planted per doc (doc_id % 8)."""
    return uni_docs(documents).select(
        "doc_id", F.expr(PRESET_TEXT_EXPR).alias("text"), "lang", "source"
    )


# Paragraph-shaped probe for paragraph-level dedup: 3 paragraphs per doc,
# the middle one drawn from a tiny boilerplate pool on half the corpus
# (newsletter/copyright footers — the classic cross-document duplicate
# paragraphs a pretraining corpus needs stripped). Dialect-common.
PARA_TEXT_EXPR = (
    "substring(text, 1, 120)"
    " || chr(10) || chr(10) ||"
    " CASE doc_id % 4"
    "   WHEN 0 THEN 'subscribe to our newsletter for the latest updates'"
    "   WHEN 1 THEN 'all rights reserved copyright example corp'"
    "   ELSE substring(text, 121, 140) END"
    " || chr(10) || chr(10) || 'doc tail ' || CAST(doc_id AS STRING)"
)

# Repetition probe for the Gopher-style quality gate: the fixture corpus is
# a near-uniform word stream with essentially zero duplicate 3-grams, so
# every 8th doc gets a spammy repeated phrase appended — true positives for
# the duplicate-3-gram rule. Dialect-common (CASE/||/%), shared verbatim by
# the Spark (F.expr) and DuckDB sides.
REPEAT_TEXT_EXPR = (
    "text || CASE WHEN doc_id % 8 = 0 "
    "THEN ' click here to win click here to win click here to win"
    " click here to win' ELSE '' END"
)

# pipeline-warc-corpus probe: the PARA paragraph structure plus a decisive
# spam tail (own paragraph) on every 8th doc — 8 repeats of the 4-word
# phrase push dup3_ratio well past GOPHER_DUP3_MAX so the repetition gate
# has unambiguous true positives inside the composed pipeline.
PWC_SPAM_PARA = " ".join(["click here to win"] * 8)
PWC_TEXT_EXPR = (
    PARA_TEXT_EXPR
    + " || CASE WHEN doc_id % 8 = 0"
    f"      THEN chr(10) || chr(10) || '{PWC_SPAM_PARA}'"
    "      ELSE '' END"
)

# Near-duplicate clone for pipeline-warc-corpus (doc_id % 10 = 5 docs,
# clone id = doc_id + 10000000, collision-free up to 10M base docs): every paragraph 'v2 '-prefixed, so the
# clone SURVIVES paragraph dedup (md5s differ) yet shares most word
# 3-gram shingles with its base — exactly the case MinHash-LSH must
# catch after paragraph dedup has stripped exact boilerplate.
PWC_CLONE_TEXT_EXPR = (
    "'v2 ' || substring(text, 1, 120)"
    " || chr(10) || chr(10) || 'v2 ' ||"
    " CASE doc_id % 4"
    "   WHEN 0 THEN 'subscribe to our newsletter for the latest updates'"
    "   WHEN 1 THEN 'all rights reserved copyright example corp'"
    "   ELSE substring(text, 121, 140) END"
    " || chr(10) || chr(10) || 'v2 doc tail ' || CAST(doc_id AS STRING)"
)

# Markdown-shaped probe: injects a title heading, optional sections, and an
# occasional fenced code block (structure/render/chunk operators need real
# markdown; the fixture corpus is a flat word stream). chr(10) == newline in
# both dialects (escape sequences in string literals are NOT dialect-common).
MD_TEXT_EXPR = (
    "'# Title ' || CAST(doc_id AS STRING) || chr(10)"
    " || substring(text, 1, 300)"
    " || CASE doc_id % 3"
    "      WHEN 0 THEN chr(10) || '## Section A' || chr(10) || 'alpha beta gamma'"
    "      WHEN 1 THEN chr(10) || '### Deep dive' "
    "      ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0"
    "      THEN chr(10) || '```' || chr(10) || 'x = 1' || chr(10) || '```'"
    "      ELSE '' END"
)

# Chunker probe: MD_TEXT_EXPR plus, on doc_id%3==2 docs (no section, no
# fence there), a two-paragraph 600-char tail that forces exactly one
# flush in the smart RAG chunker — so the accumulate/flush/overlap path
# is exercised by an input whose chunk boundaries are still closed-form
# (the fixture corpus has no newlines, verified in the oracle's docstring)
# and therefore DuckDB-replayable.
MD_CHUNK_TEXT_EXPR = (
    MD_TEXT_EXPR
    + " || CASE WHEN doc_id % 3 = 2"
    "      THEN chr(10) || chr(10) || repeat('y', 600)"
    "        || chr(10) || chr(10) || repeat('z', 600)"
    "      ELSE '' END"
)

# Probe with embedded markdown links for udf-extract-links.
LINKED_TEXT_EXPR = (
    "substring(text, 1, 150)"
    " || CASE WHEN doc_id % 2 = 0"
    "      THEN ' [Guide](https://ex.com/g/' || CAST(doc_id AS STRING)"
    "           || ') and [API](https://ex.com/api)'"
    "      ELSE '' END"
)

# markdown heading matcher — single capture group (plain string: the {1,6}
# quantifier must not pass through an f-string)
HEADING_RE = r"(?m)^(#{1,6} .*)$"
MD_LINK_RE = r"\[([^\]]*)\]\(([^)]*)\)"


def uni_docs(documents: DataFrame) -> DataFrame:
    """Spark twin of UNI_DOCS_CTE: the fixture corpus plus multibyte clone
    documents (+30M ids) whose text carries CJK / non-BMP emoji / combining
    marks at string-boundary positions. Schema-compatible with `documents`
    (n_chars recomputed for the decorated text)."""
    base = documents.select("doc_id", "text", "lang", "source", "n_chars")
    dec = documents.where(UNI_CLONE_PRED).select(
        (F.col("doc_id") + UNI_CLONE_OFFSET).alias("doc_id"),
        F.expr(UNI_TEXT_EXPR).alias("text"),
        "lang",
        "source",
    )
    dec = dec.withColumn("n_chars", F.length("text").cast("long"))
    return base.unionByName(dec)


def with_links_columns(documents: DataFrame) -> DataFrame:
    """Spark twin of LINKS_CTE — the same expression strings via F.expr."""
    return documents.select(
        "doc_id",
        F.expr(PARENT_ID_EXPR).alias("parent_id"),
        F.expr(URL_EXPR).alias("url"),
        F.expr(ANCHOR_EXPR).alias("anchor"),
        F.expr(CONTEXT_EXPR).alias("context"),
        "text",
    )


def visited_urls(documents: DataFrame) -> DataFrame:
    """Spark twin of VISITED_CTE."""
    return documents.where("doc_id % 4 = 0").select(F.expr(URL_EXPR).alias("url"))


def url_col() -> Column:
    return F.expr(URL_EXPR)


def routed_url_col() -> Column:
    return F.expr(ROUTED_URL_EXPR)


def images_from_part(part: DataFrame) -> DataFrame:
    """Spark twin of IMAGES_CTE."""
    return part.select(
        F.col("p_partkey").alias("img_id"),
        F.expr("p_partkey % 20").alias("page_id"),
        F.expr("p_partkey % 8").alias("img_index"),
        F.expr("p_size * 9").alias("w"),
        F.expr("p_size * 6").alias("h"),
        F.expr(
            "'https://cdn.example.com/img/' || "
            "CASE p_partkey % 6 WHEN 0 THEN 'icon_' WHEN 1 THEN 'logo_' ELSE '' END || "
            "replace(lower(p_name), ' ', '_') || '.png'"
        ).alias("src"),
        F.col("p_name").alias("alt"),
    )
