"""Text-pipeline operators (SURVEY §2.I): chunking UDTFs, structure
extraction, extractive summaries, link extraction, frontmatter, renderers,
and the rag/index sinks. Parity conventions per registry/crawl.py.

The LLM-kernel operators use their deterministic extractive twins here
(SURVEY §5 determinism rules); the production pandas-UDF surface
(operators/chunking.rag_chunks_smart) is registered rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ai_knowledge_etl_spark.functions import scoring, text
from ai_knowledge_etl_spark.operators import chunking
from ai_knowledge_etl_spark.registry import register
from ai_knowledge_etl_spark.registry.crawl import PAGE_SCORE_SQL
from ai_knowledge_etl_spark.sources import synthetic as syn
from ai_knowledge_etl_spark.sources.catalog import load_table

NL = "chr(10)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "udtf-chunk-text",
    f"""
WITH {syn.UNI_DOCS_CTE},
long_docs AS (SELECT doc_id, repeat(text, 5) AS text FROM udocs),
exploded AS (
  SELECT doc_id, text,
         unnest(generate_series(0, greatest(CAST(floor((length(text)-1)/1000.0) AS INT), 0))) AS i
  FROM long_docs
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       substring(text, CAST(i*1000+1 AS INT), 1000) AS chunk
FROM exploded
""".strip(),
    doc="Fixed-size chunk UDTF: 1 row → ceil(len/1000) rows "
    "(reference: agents/extractor.md:144-185, DESIGN.md:699-711). "
    "Spark: sequence+posexplode, zero Python.",
)
def q_udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    long_docs = syn.uni_docs(_docs(spark, sf_dir)).select(
        "doc_id", F.expr("repeat(text, 5)").alias("text")
    )
    return chunking.fixed_chunks(long_docs, "doc_id", "text", 1000)


@register(
    "udtf-chunk-rag",
    f"""
WITH {syn.UNI_DOCS_CTE},
long_docs AS (SELECT doc_id, repeat(text, 5) AS text FROM udocs),
exploded AS (
  SELECT doc_id, text,
         unnest(generate_series(0, least(greatest(CAST(ceil((length(text)-100)/900.0) AS INT), 1), 50) - 1)) AS i
  FROM long_docs
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       substring(text, CAST(i*900+1 AS INT), 1000) AS chunk
FROM exploded
""".strip(),
    doc="Overlapping RAG chunks: 1000 chars, 100 overlap (stride 900), "
    "≤50/doc (reference: output-transformer.md:301-330, "
    "config/limits.yaml:166-170).",
)
def q_udtf_chunk_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    long_docs = syn.uni_docs(_docs(spark, sf_dir)).select(
        "doc_id", F.expr("repeat(text, 5)").alias("text")
    )
    return chunking.rag_chunks_fixed(long_docs, "doc_id", "text", 1000, 100, 50)


@register(
    "udtf-chunk-rag-smart",
    f"""
WITH {syn.UNI_DOCS_CTE},
base AS (
  SELECT doc_id, '# Title ' || CAST(doc_id AS STRING) || chr(10)
         || substring(text, 1, 300) AS head
  FROM udocs
)
SELECT doc_id, 0 AS chunk_idx,
  CASE WHEN doc_id % 9 = 0 THEN
         head || chr(10) || chr(10) || '## Section A' || chr(10)
         || 'alpha beta gamma' || chr(10) || chr(10)
         || '```' || chr(10) || 'x = 1' || chr(10) || '```'
       WHEN doc_id % 3 = 0 THEN
         head || chr(10) || chr(10) || '## Section A' || chr(10)
         || 'alpha beta gamma'
       WHEN doc_id % 3 = 1 THEN
         head || chr(10) || chr(10) || '### Deep dive'
       ELSE head || chr(10) || repeat('y', 600)
  END AS chunk
FROM base
UNION ALL
SELECT doc_id, 1 AS chunk_idx,
       repeat('y', 100) || chr(10) || repeat('z', 600) AS chunk
FROM base WHERE doc_id % 3 = 2
""".strip(),
    doc="Production RAG chunker: heading-aware, code-blocks atomic, "
    "500-1000 chars + 100 overlap via Arrow mapInPandas "
    "(reference: output-transformer.md:301-330). Oracled (VERDICT r2 #4) "
    "by replaying the accumulation on the probe input in closed form: "
    "the fixture corpus contains no newlines/headings/fences (verified "
    "across sf0.001/0.01/0.1), so segmentation of MD_CHUNK_TEXT_EXPR is "
    "fully determined by the probe's CASE structure. doc_id%3 in (0,1) "
    "docs fit one chunk (heading + prose [+ atomic fence] joined by "
    "newline; the heading-boundary split consumes nothing, the "
    "blank-line split collapses to the single join newline). doc_id%3==2 "
    "docs carry a two-paragraph 600-char tail sized so the accumulator "
    "holds head+para1 (~913 chars ≥ min 500), flushes when para2 would "
    "exceed max 1000, and the second chunk is overlap(100 trailing "
    "'y's) + newline + para2 — the flush/overlap path, closed-form. "
    "General multi-flush behavior stays covered by "
    "tests/test_chunking.py properties and the SQL invariants twin.",
)
def q_udtf_chunk_rag_smart(spark: SparkSession, sf_dir: str) -> DataFrame:
    probed = syn.uni_docs(_docs(spark, sf_dir)).select(
        "doc_id", F.expr(syn.MD_CHUNK_TEXT_EXPR).alias("text")
    )
    return chunking.rag_chunks_smart(probed, "doc_id", "text")


@register(
    "udtf-chunk-rag-smart-invariants",
    f"""
WITH {syn.UNI_DOCS_CTE}
SELECT doc_id, TRUE AS idx_contiguous, TRUE AS chunks_nonempty,
       TRUE AS overlap_ok
FROM udocs ORDER BY doc_id
""".strip(),
    doc="SQL oracle for the smart RAG chunker (VERDICT r1 #5): the chunker "
    "itself is order-dependent mapInPandas (rows-only), but its contract IS "
    "SQL-checkable — per doc: chunk_idx runs 0..n-1 contiguously, every "
    "chunk is non-empty, and every chunk after the first starts with the "
    "previous chunk's last RAG_CHUNK_OVERLAP chars (the overlap invariant "
    "by construction, operators/chunking.py chunk_document). The query "
    "reduces the chunker output to those three booleans per doc; the "
    "oracle expects every documents row present and all TRUE — any "
    "chunker regression (dropped doc, idx gap, broken overlap) breaks "
    "the hash match.",
)
def q_udtf_chunk_rag_smart_invariants(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ai_knowledge_etl_spark import config as cfg

    chunks = q_udtf_chunk_rag_smart(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("chunk_idx")
    lagged = chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.lag("chunk").over(w).alias("prev_chunk"),
    )
    flagged = lagged.select(
        "doc_id",
        "chunk_idx",
        F.length("chunk").alias("chunk_len"),
        F.when(F.col("prev_chunk").isNull(), F.lit(True))
        .otherwise(
            F.expr(
                f"startswith(chunk, right(prev_chunk, {cfg.RAG_CHUNK_OVERLAP}))"
            )
        )
        .alias("ov_ok"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            (
                (F.min("chunk_idx") == 0)
                & (F.max("chunk_idx") == F.count("*") - 1)
            ).alias("idx_contiguous"),
            (F.min("chunk_len") > 0).alias("chunks_nonempty"),
            F.min("ov_ok").alias("overlap_ok"),
        )
        .orderBy("doc_id")
    )


@register(
    "udf-extract-structure",
    f"""
WITH probed AS (SELECT doc_id, {syn.MD_TEXT_EXPR} AS ptext FROM documents)
SELECT doc_id,
       regexp_extract(ptext, '(?m)^# (.*)$', 1) AS title,
       array_to_string(regexp_extract_all(ptext, '{syn.HEADING_RE}', 1), '|') AS headings,
       CAST(len(regexp_extract_all(ptext, '{syn.HEADING_RE}', 1)) AS INTEGER) AS n_headings
FROM probed
""".strip(),
    doc="Structure extraction: title + heading list from markdown "
    "(reference: DESIGN.md:1007-1009, crawler-summarizer.md:296-306). "
    "Pure regexp built-ins.",
)
def q_udf_extract_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    probed = _docs(spark, sf_dir).select(
        "doc_id", F.expr(syn.MD_TEXT_EXPR).alias("ptext")
    )
    headings = F.regexp_extract_all("ptext", F.lit(syn.HEADING_RE), 1)
    return probed.select(
        "doc_id",
        F.regexp_extract("ptext", r"(?m)^# (.*)$", 1).alias("title"),
        F.concat_ws("|", headings).alias("headings"),
        F.size(headings).cast("int").alias("n_headings"),
    )


@register(
    "udf-summarize-page",
    """
SELECT doc_id,
       substring(text, 1, 200) AS summary,
       array_to_string(string_split(text, ' ')[1:8], ' ') AS headline,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
FROM documents
""".strip(),
    doc="Extractive summarize twin: leading extract + first-8-word headline "
    "+ token count (reference: DESIGN.md:1271-1314; deterministic fallback "
    "per SURVEY §5). Routed through the models.summarize_pages seam — an "
    "LLM kernel drops in via the kernel= arg with the same output schema "
    "(tests/test_model_seam.py proves the swap).",
)
def q_udf_summarize_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark import models

    return models.summarize_pages(_docs(spark, sf_dir))


@register(
    "udf-extract-links",
    f"""
WITH probed AS (SELECT doc_id, {syn.LINKED_TEXT_EXPR} AS ptext FROM documents)
SELECT doc_id,
       coalesce(array_to_string(regexp_extract_all(ptext, '{syn.MD_LINK_RE}', 1), '|'), '') AS anchors,
       coalesce(array_to_string(regexp_extract_all(ptext, '{syn.MD_LINK_RE}', 2), '|'), '') AS urls,
       CAST(len(regexp_extract_all(ptext, '{syn.MD_LINK_RE}', 2)) AS INTEGER) AS n_links
FROM probed
""".strip(),
    doc="Markdown link extraction → anchors + urls "
    "(reference: agents/extractor.md:481-522).",
)
def q_udf_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    probed = _docs(spark, sf_dir).select(
        "doc_id", F.expr(syn.LINKED_TEXT_EXPR).alias("ptext")
    )
    pat = F.lit(syn.MD_LINK_RE)
    return probed.select(
        "doc_id",
        F.concat_ws("|", F.regexp_extract_all("ptext", pat, 1)).alias("anchors"),
        F.concat_ws("|", F.regexp_extract_all("ptext", pat, 2)).alias("urls"),
        F.size(F.regexp_extract_all("ptext", pat, 2)).cast("int").alias("n_links"),
    )


@register(
    "project-frontmatter",
    f"""
WITH fm_t AS (
  SELECT doc_id,
         '---' || {NL} || 'source: ' || source || {NL}
         || 'title: ' || substring(text, 1, 40) || {NL} || '---' AS fm
  FROM documents
)
SELECT doc_id, fm,
       regexp_extract(fm, '(?m)^title: (.*)$', 1) AS title_parsed,
       regexp_extract(fm, '(?m)^source: (.*)$', 1) AS source_parsed
FROM fm_t
""".strip(),
    doc="Frontmatter emit + parse roundtrip (reference: "
    "scripts/extract-jina.sh:74-83, crawler-summarizer.md:161-185).",
)
def q_project_frontmatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    nl = F.lit("\n")
    fm = F.concat(
        F.lit("---"), nl,
        F.lit("source: "), F.col("source"), nl,
        F.lit("title: "), F.substring("text", 1, 40), nl,
        F.lit("---"),
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", fm.alias("fm"))
        .select(
            "doc_id",
            "fm",
            F.regexp_extract("fm", r"(?m)^title: (.*)$", 1).alias("title_parsed"),
            F.regexp_extract("fm", r"(?m)^source: (.*)$", 1).alias("source_parsed"),
        )
    )


@register(
    "udf-render-markdown",
    f"""
WITH pages AS (SELECT doc_id, text, {PAGE_SCORE_SQL} AS relevance FROM documents)
SELECT doc_id,
       '# ' || substring(text, 1, 40) || {NL} || {NL}
       || substring(text, 1, 200) || {NL} || '---' || {NL}
       || 'relevance: ' ||
       CASE WHEN relevance >= 9 THEN '*****' WHEN relevance >= 7 THEN '****-'
            WHEN relevance >= 5 THEN '***--' WHEN relevance >= 3 THEN '**---'
            ELSE '*----' END AS md
FROM pages
""".strip(),
    doc="IR → markdown doc render (reference: DESIGN.md:1330-1407): "
    "title, body extract, footer with star band. concat projection, no UDF.",
)
def q_udf_render_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.registry.crawl import _page_score_col

    nl = F.lit("\n")
    pages = _docs(spark, sf_dir).select(
        "doc_id", "text", _page_score_col().alias("relevance")
    )
    md = F.concat(
        F.lit("# "), F.substring("text", 1, 40), nl, nl,
        F.substring("text", 1, 200), nl, F.lit("---"), nl,
        F.lit("relevance: "), scoring.stars("relevance"),
    )
    return pages.select("doc_id", md.alias("md"))


@register(
    "agg-hierarchical-summary",
    """
WITH page_summaries AS (
  SELECT doc_id, source, substring(text, 1, 80) AS summary FROM documents
)
SELECT source,
       substring(string_agg(summary, ' | ' ORDER BY doc_id ASC), 1, 500) AS combined,
       CAST(count(*) AS BIGINT) AS n_pages
FROM page_summaries GROUP BY source
""".strip(),
    doc="Hierarchical partial→final summarization: 80-char page extracts → "
    "per-source combined digest capped at 500 chars (reference: "
    "config/limits.yaml:143-163, README.md:163-202 — the summarize-then-"
    "combine cascade; Spark's partial/final aggregate split is the same "
    "shape at the physical level).",
)
def q_agg_hierarchical_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _docs(spark, sf_dir).select(
        "doc_id", "source", F.substring("text", 1, 80).alias("summary")
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("doc_id", "summary"))),
        lambda s: s["summary"],
    )
    return pages.groupBy("source").agg(
        F.substring(F.concat_ws(" | ", ordered), 1, 500).alias("combined"),
        F.count("*").alias("n_pages"),
    )


@register(
    "agg-approx-distinct",
    f"""
WITH {syn.LINKS_CTE}
SELECT CAST(count(DISTINCT regexp_replace(regexp_replace(url, '#.*$', ''), '/$', '')) AS BIGINT)
       AS exact_urls,
       TRUE AS within_5pct
FROM links
""".strip(),
    doc="approx_count_distinct (HyperLogLog++) over normalized URLs — the "
    "100 TB substitute for exact countDistinct (SURVEY §2.E coverage note). "
    "Oracled as a bound check (VERDICT r1 #5): the query emits the EXACT "
    "distinct count plus a boolean asserting the HLL estimate landed "
    "within ±5%; the oracle computes the exact count and expects TRUE — "
    "so an HLL regression breaks the hash match. The estimate runs at "
    "rsd=0.01, NOT the 0.05 default: rsd is a STANDARD deviation, so a "
    "±5% gate over a 5%-rsd sketch is a 1-sigma assertion that fails a "
    "third of fixture re-instantiations — the seed-17 sweep caught "
    "exactly that (estimate outside the gate on a re-keyed corpus that "
    "default layout and seeds 3/7/13 had passed by luck). At rsd=0.01 "
    "the gate is a 5-sigma margin: a real accuracy property, "
    "seed-robust. tests/test_functions.py keeps the direct tolerance "
    "assertion.",
    # the oracle checks the exact count + a bound assertion; it never
    # builds an HLL sketch, so its wall is not an engine comparison
    oracle_kind="replay",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.functions import urls as U
    from ai_knowledge_etl_spark.sources import synthetic as syn2

    links = syn2.with_links_columns(_docs(spark, sf_dir))
    # aggregate over the DISTINCT normalized urls, not the raw stream:
    # HLL register updates are max()es, so duplicate inputs cannot change
    # the sketch — the estimate (and the exact count) are value-identical
    # by construction. The old mixed countDistinct+approx single agg made
    # Catalyst plan an Expand whose partial phase groups BY the distinct
    # url — allocating and shuffling one rsd=0.01 HLL buffer (~16 KB) PER
    # DISTINCT URL instead of per partition (measured at sf0.1: 1.92 →
    # 1.11 s same-session min-of-5). At scale the distinct shuffle moves
    # only normalized urls; the sketch stays one buffer per partition.
    d = links.select(U.normalize("url").alias("u")).distinct()
    return d.agg(
        F.count("u").cast("bigint").alias("exact_urls"),
        F.approx_count_distinct("u", 0.01).alias("__approx"),
    ).select(
        "exact_urls",
        (
            F.abs(F.col("__approx") - F.col("exact_urls"))
            <= 0.05 * F.col("exact_urls")
        ).alias("within_5pct"),
    )


@register(
    "agg-hll-sketch-merge",
    """
SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_5pct
""".strip()
    + "\nFROM events",
    doc="Mergeable HLL sketches (Spark 3.5+ hll_sketch_agg / hll_union_agg "
    "/ hll_sketch_estimate): per-event_type user sketches unioned into a "
    "global distinct estimate — the pre-aggregation pattern that makes "
    "100 TB distinct-counting incremental (daily sketch tables union into "
    "any window without rescanning raw events; plain approx_count_distinct "
    "cannot compose that way). Bound-check oracle like agg-approx-distinct: "
    "the merged estimate must land within ±5% of exact or the hash breaks.",
)
def q_agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    # lgConfigK=16 (not the 12 default): default rsd ~1.6% makes the ±5%
    # gate a ~3-sigma assertion; 16 gives rsd ~0.4% → ~12 sigma. Same
    # rsd-vs-gate reasoning as agg-approx-distinct (seed-17 lesson).
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(16)).alias("sk")
    )
    merged = per_type.agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est"),
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_types",
        "exact_users",
        (
            F.abs(F.col("__est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_5pct"),
    )


@register(
    "agg-approx-percentile-gate",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       TRUE AS p50_ok, TRUE AS p95_ok
FROM events GROUP BY event_type
""".strip(),
    doc="approx_percentile (t-digest) accuracy gate per group — the 100 TB "
    "substitute for the exact interpolated percentile (agg-percentiles' "
    "own doc prescribes the swap). Same bound-check oracle pattern as "
    "agg-approx-distinct/agg-hll-sketch-merge: the query computes exact "
    "AND sketch percentiles in one pass and emits booleans asserting the "
    "sketch landed within 5%; the oracle expects TRUE, so a t-digest "
    "regression breaks the hash.",
)
def q_agg_approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.expr("percentile(v, 0.5)").alias("__p50"),
        F.expr("percentile(v, 0.95)").alias("__p95"),
        F.expr("approx_percentile(v, 0.5, 1000)").alias("__a50"),
        F.expr("approx_percentile(v, 0.95, 1000)").alias("__a95"),
    )

    def ok(a: str, e: str):
        return F.abs(F.col(a) - F.col(e)) <= 0.05 * F.greatest(
            F.abs(F.col(e)), F.lit(1.0)
        )

    return g.select(
        "event_type",
        "n_events",
        ok("__a50", "__p50").alias("p50_ok"),
        ok("__a95", "__p95").alias("p95_ok"),
    )


@register(
    "sink-index-report",
    """
SELECT source,
       '- [' || source || '] pages=' || CAST(CAST(count(*) AS BIGINT) AS STRING)
       || ' chars=' || CAST(CAST(sum(n_chars) AS BIGINT) AS STRING) AS line
FROM documents GROUP BY source
""".strip(),
    doc="INDEX.md line rendering from aggregates "
    "(reference: crawler-summarizer.md:188-284).",
)
def q_sink_index_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.concat(
                F.lit("- ["), F.col("source"),
                F.lit("] pages="), F.count("*").cast("string"),
                F.lit(" chars="), F.sum("n_chars").cast("string"),
            ).alias("line")
        )
    )


@register(
    "udf-retry-backoff",
    """
WITH attempts AS (SELECT unnest(generate_series(1, 5)) AS attempt)
SELECT CAST(attempt AS INTEGER) AS attempt,
       CAST(least(power(2.0, attempt - 1) * 1.0, 10.0) AS DOUBLE) AS delay_s
FROM attempts
""".strip(),
    doc="Retry backoff schedule 1s→2s→4s→8s→10s-cap as data "
    "(reference: agents/extractor.md:694-737, config/limits.yaml:125-129); "
    "the executor-side wrapper enforcing it is sources/web.retry_with_backoff.",
)
def q_udf_retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1, 6).select(
        F.col("id").cast("int").alias("attempt"),
        F.least(F.pow(F.lit(2.0), F.col("id") - 1), F.lit(10.0))
        .cast("double")
        .alias("delay_s"),
    )


@register(
    "sink-pipe-skill",
    f"""
SELECT source,
       '---' || {NL} || 'name: knowledge-' || source || {NL}
       || 'description: extracted corpus from ' || source
       || ' (' || CAST(CAST(count(*) AS BIGINT) AS STRING) || ' pages)' || {NL}
       || '---' || {NL} || '# knowledge-' || source AS skill_doc
FROM documents GROUP BY source
""".strip(),
    doc="--pipe=skill sink: SKILL.md-shaped document per source "
    "(reference: output-transformer.md:140-370).",
)
def q_sink_pipe_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    nl = F.lit("\n")
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.concat(
                F.lit("---"), nl,
                F.lit("name: knowledge-"), F.col("source"), nl,
                F.lit("description: extracted corpus from "), F.col("source"),
                F.lit(" ("), F.count("*").cast("string"), F.lit(" pages)"), nl,
                F.lit("---"), nl,
                F.lit("# knowledge-"), F.col("source"),
            ).alias("skill_doc")
        )
    )


@register(
    "sink-pipe-plugin",
    """
SELECT source,
       '{"name":"knowledge-' || source || '","pages":'
       || CAST(CAST(count(*) AS BIGINT) AS STRING)
       || ',"chars":' || CAST(CAST(sum(n_chars) AS BIGINT) AS STRING) || '}' AS manifest
FROM documents GROUP BY source
""".strip(),
    doc="--pipe=plugin sink: manifest JSON per source "
    "(reference: output-transformer.md:140-370).",
)
def q_sink_pipe_plugin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.concat(
                F.lit('{"name":"knowledge-'), F.col("source"),
                F.lit('","pages":'), F.count("*").cast("string"),
                F.lit(',"chars":'), F.sum("n_chars").cast("string"),
                F.lit("}"),
            ).alias("manifest")
        )
    )


@register(
    "sink-pipe-prompt",
    f"""
SELECT doc_id,
       'You are given document ' || CAST(doc_id AS STRING) || ' from '
       || source || '.' || {NL}
       || substring(text, 1, 200) || {NL}
       || 'Summarize the key points.' AS prompt
FROM documents
""".strip(),
    doc="--pipe=prompt sink: per-document prompt rendering "
    "(reference: output-transformer.md:140-370).",
)
def q_sink_pipe_prompt(spark: SparkSession, sf_dir: str) -> DataFrame:
    nl = F.lit("\n")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("You are given document "), F.col("doc_id").cast("string"),
            F.lit(" from "), F.col("source"), F.lit("."), nl,
            F.substring("text", 1, 200), nl,
            F.lit("Summarize the key points."),
        ).alias("prompt"),
    )


@register(
    "sink-pipe-rag",
    """
WITH exploded AS (
  SELECT doc_id, source, text,
         unnest(generate_series(0, least(greatest(CAST(ceil((length(text)-100)/900.0) AS INT), 1), 50) - 1)) AS i
  FROM documents
)
SELECT CAST(doc_id AS STRING) || '_' || CAST(i AS STRING) AS id,
       substring(text, CAST(i*900+1 AS INT), 1000) AS content,
       '{"source":"' || source || '","section":' || CAST(i AS STRING) || '}' AS metadata
FROM exploded
""".strip(),
    doc="--pipe=rag sink: chunk records {id, content, metadata} "
    "(reference: output-transformer.md:309-320). Metadata JSON is built by "
    "concat so both engines emit byte-identical strings (to_json key order "
    "is engine-specific).",
)
def q_sink_pipe_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = chunking.rag_chunks_fixed(
        _docs(spark, sf_dir).select("doc_id", "source", "text"),
        "doc_id",
        "text",
        1000,
        100,
        50,
    )
    # rag_chunks_fixed keeps only id+chunk cols; rejoin source via doc_id
    src = _docs(spark, sf_dir).select("doc_id", "source")
    out = chunks.join(F.broadcast(src), "doc_id")
    return out.select(
        F.concat(
            F.col("doc_id").cast("string"), F.lit("_"),
            F.col("chunk_idx").cast("string"),
        ).alias("id"),
        F.col("chunk").alias("content"),
        F.concat(
            F.lit('{"source":"'), F.col("source"),
            F.lit('","section":'), F.col("chunk_idx").cast("string"),
            F.lit("}"),
        ).alias("metadata"),
    )


@register(
    "sink-pipe-docs",
    f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n_pages
  FROM documents
)
SELECT source,
       '# Documentation: ' || source || {NL}
       || 'Pages: ' || CAST(max(n_pages) AS STRING) || {NL}
       || string_agg(
            '- [doc_' || lpad(CAST(doc_id AS STRING), 6, '0') || '](doc_'
            || lpad(CAST(doc_id AS STRING), 6, '0') || '.md) '
            || CAST(n_chars AS STRING) || ' chars',
            {NL} ORDER BY doc_id) AS docs_index
FROM ranked WHERE rn <= 10 GROUP BY source
""".strip(),
    doc="--pipe=docs sink: per-source documentation index page — title, "
    "page count, and a TOC of the first 10 docs with zero-padded ids so "
    "lexical and numeric orderings agree (reference: "
    "agents/output-transformer.md:140-370 'docs' format; README.md:115-123). "
    "Scale: the TOC is capped per group by a rank window BEFORE the "
    "string aggregation, so the concat never sees more than 10 rows per "
    "source regardless of corpus size.",
)
def q_sink_pipe_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nl = F.lit("\n")
    d = _docs(spark, sf_dir).select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy("doc_id")
    wp = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n_pages"),
    ).where(F.col("rn") <= 10)
    pad = F.lpad(F.col("doc_id").cast("string"), 6, "0")
    entry = F.concat(
        F.lit("- [doc_"), pad, F.lit("](doc_"), pad, F.lit(".md) "),
        F.col("n_chars").cast("string"), F.lit(" chars"),
    )
    return (
        ranked.select("source", "n_pages", entry.alias("entry"))
        .groupBy("source")
        .agg(
            F.concat(
                F.lit("# Documentation: "), F.col("source"), nl,
                F.lit("Pages: "), F.max("n_pages").cast("string"), nl,
                F.concat_ws("\n", F.array_sort(F.collect_list("entry"))),
            ).alias("docs_index")
        )
    )


@register(
    "udf-tfidf-keywords",
    """
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokens WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / df.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term ASC
         ) AS rnk
  FROM tf JOIN df ON tf.term = df.term
)
SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, tf, df, score
FROM scored WHERE rnk <= 3
""".strip(),
    doc="TF-IDF-family keyword extraction: top-3 characteristic terms per "
    "document, scored tf/df (rational idf — a single IEEE division is "
    "correctly rounded on both engines, whereas ln() differs by ulps "
    "between libm and Math.log, so the cross-engine diff stays exact). "
    "Reference analog: the keyword/topic surface of agents/extractor.md. "
    "Scale: tokenize+explode is map-side; tf is one shuffle on "
    "(doc_id,term); df aggregates the much smaller tf frame per term and "
    "is broadcast back (vocabulary ≪ corpus); top-k is a per-doc window "
    "on the tf partitioning — no global sort anywhere.",
)
def q_udf_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    tf = tokens.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(
        score.desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(df), "term")
        .select(
            "doc_id",
            F.row_number().over(w).cast("int").alias("rnk"),
            "term",
            "tf",
            "df",
            score.alias("score"),
        )
        .where(F.col("rnk") <= 3)
    )


@register(
    "udtf-lateral-chunks",
    f"""
WITH {syn.UNI_DOCS_CTE},
exploded AS (
  SELECT doc_id, text,
         unnest(generate_series(0, least(CAST(floor((length(text)-1)/400.0) AS INT), 19))) AS i
  FROM udocs WHERE length(text) > 0
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       CAST(length(substring(text, CAST(i*400+1 AS INT), 400)) AS BIGINT) AS n_chars,
       md5(substring(text, CAST(i*400+1 AS INT), 400)) AS fp
FROM exploded
""".strip(),
    doc="NATIVE Python UDTF through SQL LATERAL (the Spark-4 table-function "
    "API surface, distinct from the mapInPandas chunkers): a @udtf class "
    "registered via spark.udtf.register and invoked as "
    "`FROM docs, LATERAL chunk_udtf(doc_id, text)` — one input row "
    "yields up to 20 fixed 400-char chunk rows. Row-at-a-time Python by "
    "design (a deliberate API-coverage entry like the pandas_udf pair in "
    "training.py — the HOT-path chunkers stay Arrow/mapInPandas); runs "
    "over the multibyte probe corpus, so the substring arithmetic is "
    "character-based on both engines. The oracle replays chunk count, "
    "per-chunk char length, and content fingerprint in closed form.",
)
def q_udtf_lateral_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_chars long, fp string")
    class ChunkUDTF:
        def eval(self, text: str):
            import hashlib

            if not text:
                return
            for idx in range(min((len(text) - 1) // 400 + 1, 20)):
                chunk = text[idx * 400 : idx * 400 + 400]
                yield (
                    idx,
                    len(chunk),
                    hashlib.md5(chunk.encode("utf-8")).hexdigest(),
                )

    spark.udtf.register("chunk_udtf", ChunkUDTF)
    probed = syn.uni_docs(_docs(spark, sf_dir)).select("doc_id", "text")
    view = "udtf_docs_src"
    probed.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT d.doc_id, c.chunk_idx, c.n_chars, c.fp "
        f"FROM {view} d, LATERAL chunk_udtf(d.text) c"
    )
