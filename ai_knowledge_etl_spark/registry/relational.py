"""Relational operators over the star schema (SURVEY §2.D/E/F/G/H).

TPC-H-style joins/aggregates/windows stand in for the reference's
links ⋈ pages ⋈ visited workload at scale (FIXTURES.md). Parity notes on top
of registry/crawl.py's conventions:

  - Money sums run over DECIMAL(18,x) then CAST to DOUBLE: exact decimal
    arithmetic makes the result bit-identical regardless of summation order,
    so no rounding tolerance is needed at all.
  - Every window with an ORDER BY uses an explicit ROWS frame and a unique
    ordering key — default RANGE frames + ties would be engine-dependent.
  - Every LIMIT carries a deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config
from ai_knowledge_etl_spark.functions import parity
from ai_knowledge_etl_spark.operators import batching, ids, topk
from ai_knowledge_etl_spark.registry import register
from ai_knowledge_etl_spark.registry.crawl import LINK_SCORE_SQL, PAGE_SCORE_SQL
from ai_knowledge_etl_spark.session import eager_cut
from ai_knowledge_etl_spark.sources import synthetic as syn
from ai_knowledge_etl_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


# --- §2.E aggregations ----------------------------------------------------------


@register(
    "agg-queue-stats",
    f"""
SELECT CAST(count(*) AS BIGINT) AS n_tasks,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_size,
       CAST(ceil(count(*) / {config.BATCH_MAX_FILES}.0) AS BIGINT) AS estimated_batches
FROM orders
""".strip(),
    doc="TaskQueue {totalSize, estimatedBatches} (reference: DESIGN.md:580-585); "
    "orders stand in for the task table.",
)
def q_agg_queue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_tasks"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_size"),
        F.ceil(F.count("*") / config.BATCH_MAX_FILES)
        .cast("bigint")
        .alias("estimated_batches"),
    )


@register(
    "agg-ir-stats",
    """
SELECT CAST(count(*) AS BIGINT) AS files_processed,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       max(value) AS max_value,
       min(value) AS min_value
FROM events
""".strip(),
    doc="IR stats with error-as-data conditional count "
    "(reference: DESIGN.md:1092-1099); events stand in for processing records.",
)
def q_agg_ir_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = F.col("event_type")
    return _t(spark, sf_dir, "events").agg(
        F.count("*").alias("files_processed"),
        F.sum(F.when(e == "error", 1).otherwise(0)).alias("errors"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
    )


@register(
    "agg-group-by-subtopic",
    """
SELECT lang AS subtopic,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       array_to_string(list_sort(list(DISTINCT source)), ',') AS sources
FROM documents GROUP BY lang
""".strip(),
    doc="REPORT key points grouped by subtopic with per-group source sets "
    "(reference: crawler-summarizer.md:105-107,256-267). Sorted-set-as-string "
    "keeps the comparison order-stable.",
)
def q_agg_group_by_subtopic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.col("lang").alias("subtopic"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.concat_ws(",", F.sort_array(F.collect_set("source"))).alias(
                "sources"
            ),
        )
    )


@register(
    "agg-transform-route",
    f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS pages,
       CAST(sum(n_chars) AS BIGINT) AS chars,
       CASE WHEN count(*) > {config.TRANSFORM_INDEX_ONLY_PAGES} THEN 'index_only'
            WHEN count(*) > {config.TRANSFORM_SUMMARIZE_PAGES}
                 OR sum(n_chars) > {config.TRANSFORM_SUMMARIZE_CHARS} THEN 'summarize_first'
            ELSE 'direct' END AS route
FROM documents GROUP BY source
""".strip(),
    doc="Transform strategy off aggregates (reference: "
    "agents/output-transformer.md:77-105): >10 pages index_only, >5 pages or "
    ">30k chars summarize_first, else direct.",
)
def q_agg_transform_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _t(spark, sf_dir, "documents").groupBy("source")
    pages, chars = F.count("*"), F.sum("n_chars")
    return g.agg(
        pages.alias("pages"),
        chars.alias("chars"),
        F.when(pages > config.TRANSFORM_INDEX_ONLY_PAGES, "index_only")
        .when(
            (pages > config.TRANSFORM_SUMMARIZE_PAGES)
            | (chars > config.TRANSFORM_SUMMARIZE_CHARS),
            "summarize_first",
        )
        .otherwise("direct")
        .alias("route"),
    )


@register(
    "agg-distinct-urls",
    f"""
WITH {syn.LINKS_CTE}
SELECT CAST(count(DISTINCT regexp_replace(regexp_replace(url, '#.*$', ''), '/$', '')) AS BIGINT)
       AS distinct_urls
FROM links
""".strip(),
    doc="countDistinct over normalized visited URLs (reference: "
    "crawler-queue.sh:138-145 url-map keying).",
)
def q_agg_distinct_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.functions import urls as U

    links = syn.with_links_columns(_t(spark, sf_dir, "documents"))
    return links.agg(
        F.countDistinct(U.normalize("url")).alias("distinct_urls")
    )


@register(
    "agg-rollup-bands",
    """
SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY ROLLUP(lang, source)
""".strip(),
    doc="ROLLUP hierarchy totals (SURVEY §2.E coverage note: grouping sets "
    "are Spark built-ins; this exposes the lang → source → grand-total "
    "rollup the reference's hierarchical summaries imply).",
)
def q_agg_rollup_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .rollup("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "n_docs",
            "total_chars",
        )
    )


@register(
    "agg-pricing-summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS sum_base_price,
       CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                AS DECIMAL(38,0)))
            AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                * (100 + CAST(round(l_tax * 100) AS BIGINT))
                AS DECIMAL(38,0)))
            AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""".strip(),
    doc="TPC-H-Q1-style pricing summary — the hash-aggregate representative; "
    "Catalyst runs it as partial+final aggregate with no extra shuffle "
    "(the reference's hierarchical summarize-then-combine, SURVEY §2.E). "
    "Arithmetic in EXACT BIGINT cents (the agg-mad-outliers lesson): the "
    "2-decimal columns reconstruct to integers via round(x*100) — no tie "
    "risk — the per-row PRODUCT chain stays BIGINT (peaks ≈1.1e11 « 2^63 "
    "at any corpus size), but the two at-risk ACCUMULATORS are pre-widened "
    "to DECIMAL(38,0) in BOTH engines (r8 ADVICE): a plain-BIGINT "
    "sum_charge wraps silently around sf~14 (≈8e7 rows/group × 1.1e11) in "
    "Spark's non-ANSI mode while DuckDB promotes to HUGEINT — a silent "
    "scale divergence. sum_qty/sum_base_price keep the BIGINT accumulator: "
    "per-row ≤ 5e5 / 1.05e7 cents bounds the sum under 2^63 even if a "
    "single group held ALL ~6e11 lineitem rows of a 100 TB corpus "
    "(3e17 / 6.3e18 < 9.2e18). Widening costs ~+0.2 s at sf0.1 vs "
    "all-BIGINT (0.5→0.7); all-DECIMAL was 1.23 s.",
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")

    def cents(c: str) -> F.Column:
        return F.round(F.col(c) * 100).cast("long")

    pc, dc, tc = (
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
    )
    # per-row products in BIGINT (exact, bounded); the two accumulators
    # whose group sums can cross 2^63 below 100 TB scale are widened to
    # DECIMAL(38,0) BEFORE the sum — see the register() doc.
    disc = (pc * (F.lit(100) - dc)).cast("decimal(38,0)")
    charge = (pc * (F.lit(100) - dc) * (F.lit(100) + tc)).cast(
        "decimal(38,0)"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"),
        (F.sum(pc).cast("double") / 100.0).alias("sum_base_price"),
        (F.sum(disc).cast("double") / 10000.0).alias("sum_disc_price"),
        (F.sum(charge).cast("double") / 1000000.0).alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


# --- §2.D joins ------------------------------------------------------------------


@register(
    "join-star-revenue",
    """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1997
GROUP BY n.n_name
""".strip(),
    doc="TPC-H-Q5-style star join: fact ⋈ 4 dimensions. Dimensions broadcast "
    "(Catalyst does this automatically under the size threshold; explicit "
    "hints keep it true when stats are missing) — one shuffle total, for the "
    "final groupBy. links⋈pages⋈visited at 100 TB takes this exact shape.",
)
def q_join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return joined.groupBy("n_name").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "topk-customer-revenue",
    """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""".strip(),
    doc="TPC-H-Q10-style returned-revenue top-20: join + agg + "
    "TakeOrderedAndProject (no global sort).",
)
def q_topk_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    return topk.top_k(agg, 20, F.desc("revenue"), F.asc("c_custkey"))


@register(
    "join-image-meta",
    f"""
WITH {syn.IMAGES_CTE},
meta AS (
  SELECT p_partkey % 8 AS m_index, min(p_brand) AS brand
  FROM part GROUP BY p_partkey % 8
)
SELECT i.img_id, i.img_index, i.alt, m.brand
FROM images i JOIN meta m ON i.img_index = m.m_index
""".strip(),
    doc="images.json metadata ⋈ downloaded bytes on index "
    "(reference: commands/extract.md:490-536).",
)
def q_join_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    images = syn.images_from_part(part)
    meta = part.groupBy(F.expr("p_partkey % 8").alias("m_index")).agg(
        F.min("p_brand").alias("brand")
    )
    return images.join(
        F.broadcast(meta), images.img_index == meta.m_index
    ).select("img_id", "img_index", "alt", "brand")


@register(
    "join-volume-shipping",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""".strip(),
    doc="TPC-H-Q7 shape: bidirectional nation pair with a disjunctive "
    "filter across two dimension copies of the same table — the two nation "
    "joins broadcast independently; the OR predicate can't push below "
    "either alone so it filters post-join, exactly where Catalyst puts it.",
)
def q_join_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(
            (
                (F.col("supp_nation") == "NATION_18")
                & (F.col("cust_nation") == "NATION_19")
            )
            | (
                (F.col("supp_nation") == "NATION_19")
                & (F.col("cust_nation") == "NATION_18")
            )
        )
    )
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).agg(F.sum(vol).cast("double").alias("volume"))


@register(
    "join-nested-semi-threshold",
    """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  GROUP BY l_suppkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > (
    SELECT CAST(0.09 * sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) FROM lineitem
  )
)
""".strip(),
    doc="TPC-H-Q20 shape: semi join against an aggregated subquery with a "
    "scalar-subquery threshold (suppliers moving >9% of total volume). "
    "DECIMAL sums keep the > comparison exact on both engines.",
)
def q_join_nested_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    total = li.agg(
        F.sum(_dec("l_quantity")).alias("t")
    ).first()["t"]
    total = 0.0 if total is None else total  # empty table: no heavy suppliers
    heavy = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .where(F.col("q").cast("double") > 0.09 * float(total))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return s.join(heavy, "s_suppkey", "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "agg-cube",
    """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""".strip(),
    doc="CUBE over (returnflag, linestatus): all four grouping "
    "granularities in one pass (SURVEY §2.E coverage note).",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n_items",
            "sum_qty",
        )
    )


@register(
    "join-min-per-group",
    """
WITH mins AS (
  SELECT c_nationkey, min(c_acctbal) AS min_bal FROM customer GROUP BY c_nationkey
)
SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal
FROM customer c JOIN mins m
  ON c.c_nationkey = m.c_nationkey AND c.c_acctbal = m.min_bal
""".strip(),
    doc="TPC-H-Q2 shape: row(s) achieving the per-group minimum via a "
    "grouped subquery join (the correlated-min pattern). min over raw "
    "doubles is order-independent, so no decimal trick needed.",
)
def q_join_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    mins = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.min("c_acctbal").alias("min_bal")
    )
    return (
        c.join(
            F.broadcast(mins),
            (c.c_nationkey == mins.nk) & (c.c_acctbal == mins.min_bal),
        )
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )


@register(
    "join-avg-subquery",
    """
WITH part_avg AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * count(*)) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT l.l_partkey,
       CAST(count(*) AS BIGINT) AS n_small,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS small_revenue
FROM lineitem l JOIN part_avg p ON l.l_partkey = p.l_partkey
WHERE l.l_quantity < 0.5 * p.avg_qty
GROUP BY l.l_partkey
""".strip(),
    doc="TPC-H-Q17 shape: filter a fact table against a per-key aggregate of "
    "itself (small-quantity revenue). The threshold avg is exact BIGINT "
    "cents (order-invariant like the DECIMAL form it replaces, r9 — the "
    "only solo-confirmed r8 regression; the plan audit found the "
    "broadcast and join-condition placement intact, so the lever was "
    "the two 128-bit decimal sums: cents reads 0.6 vs 1.0 s warm at "
    "sf0.1). Overflow-safe at ANY corpus size: lineitems-per-partkey is "
    "~30 (both tables scale together), so group sums peak ~1.5e5 qty / "
    "~3e8 price cents — never corpus-sized. Both engines convert the "
    "identical exact sums to DOUBLE via the same expression, so the < "
    "threshold and small_revenue are bit-identical.",
)
def q_join_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")

    def cents(c: str) -> F.Column:
        return F.round(F.col(c) * 100).cast("long")

    avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(cents("l_quantity")).cast("double") / (100.0 * F.count("*")))
        .alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg), li.l_partkey == avg.pk)
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0)
            .alias("small_revenue"),
        )
    )


@register(
    "join-semi-anti-exists",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""".strip(),
    doc="TPC-H-Q21 shape: EXISTS + NOT EXISTS as left_semi + left_anti "
    "joins (the frontier/visited pattern generalized — customers with "
    "completed orders and no open ones).",
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    f_orders = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o_orders = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(f_orders, "c_custkey", "left_semi")
        .join(o_orders, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "agg-pivot-lang",
    """
SELECT source,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh,
       CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
       CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es
FROM documents GROUP BY source
""".strip(),
    doc="Pivot: per-source language distribution. Spark `pivot` with an "
    "explicit value list compiles to exactly the conditional aggregation "
    "the oracle states (no extra pass to discover values).",
)
def q_agg_pivot_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .pivot("lang", ["en", "zh", "de", "fr", "es"])
        .count()
        .na.fill(0)
    )


@register(
    "agg-grouping-sets",
    """
SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY GROUPING SETS ((lang), (source), ())
""".strip(),
    doc="Explicit grouping sets (per-lang, per-source, grand total) — the "
    "three INDEX summary granularities in one pass (SURVEY §2.E coverage "
    "note).",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__docs_gs")
    return spark.sql(
        """
        SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
               count(*) AS n_docs
        FROM __docs_gs
        GROUP BY GROUPING SETS ((lang), (source), ())
        """
    )


# --- §2.F sorts / limits / top-k ---------------------------------------------------


@register(
    "sort-priority-pop",
    f"""
WITH {syn.LINKS_CTE},
pages AS (
  SELECT doc_id AS parent_key, {PAGE_SCORE_SQL} AS parent_relevance
  FROM documents WHERE doc_id < 50
),
frontier AS (
  SELECT l.doc_id, l.url,
         CAST({LINK_SCORE_SQL}
              + CASE WHEN p.parent_relevance >= 8 THEN 3
                     WHEN p.parent_relevance >= 5 THEN 1 ELSE 0 END AS INTEGER) AS priority
  FROM links l JOIN pages p ON l.parent_id = p.parent_key
)
SELECT doc_id, url, priority FROM frontier
ORDER BY priority DESC, doc_id ASC
LIMIT 5
""".strip(),
    doc="Pop the top-priority frontier wave (reference: "
    "crawler-queue.sh:57-77, batched per-wave variant).",
)
def q_sort_priority_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.registry.crawl import (
        q_score_priority,
    )

    frontier = q_score_priority(spark, sf_dir).select(
        "doc_id", "url", "priority"
    )
    return topk.top_k(frontier, 5, F.desc("priority"), F.asc("doc_id"))


@register(
    "sort-batch-smallest-first",
    """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice ASC, o_orderkey ASC
LIMIT 100
""".strip(),
    doc="Plans sorted ascending by estimated size before packing "
    "(reference: DESIGN.md:740-741).",
)
def q_sort_batch_smallest_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.top_k(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        100,
        F.asc("o_totalprice"),
        F.asc("o_orderkey"),
    )


@register(
    "topk-images-per-page",
    f"""
WITH {syn.IMAGES_CTE},
ranked AS (
  SELECT page_id, img_id, img_index, w, h,
         row_number() OVER (PARTITION BY page_id
                            ORDER BY img_index ASC, img_id ASC) AS rn
  FROM images
)
SELECT page_id, img_id, img_index, w, h FROM ranked WHERE rn <= {config.IMAGES_PER_PAGE_CAP}
""".strip(),
    doc="Per-page image cap = top-N per group via ranking window "
    "(reference: commands/extract.md:489, config/limits.yaml:59-60).",
)
def q_topk_images_per_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    images = syn.images_from_part(_t(spark, sf_dir, "part"))
    return topk.top_k_per_group(
        images.select("page_id", "img_id", "img_index", "w", "h"),
        ["page_id"],
        config.IMAGES_PER_PAGE_CAP,
        F.asc("img_index"),
        F.asc("img_id"),
    )


@register(
    "limit-caps",
    f"""
SELECT doc_id, source FROM documents
ORDER BY doc_id ASC
LIMIT {config.MAX_PAGES_DEFAULT}
""".strip(),
    doc="max_pages session cap (reference: config/limits.yaml:101-104); "
    "deterministic order so the LIMIT is well-defined.",
)
def q_limit_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.top_k(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        config.MAX_PAGES_DEFAULT,
        F.asc("doc_id"),
    )


@register(
    "sort-index-list",
    """
SELECT doc_id, lpad(CAST(doc_id AS STRING), 3, '0') AS page_id, source
FROM documents
""".strip(),
    doc="INDEX page table ordered by crawl id (reference: "
    "crawler-summarizer.md:211-217). Comparison is order-insensitive; the "
    "padded id column is the ordering surface.",
)
def q_sort_index_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 3, "0").alias("page_id"),
        "source",
    )


# --- §2.G set ops / dedup / windowed assignment -------------------------------------


@register(
    "union-link-batches",
    f"""
WITH {syn.LINKS_CTE}
SELECT url FROM links WHERE doc_id % 2 = 0
UNION ALL
SELECT url FROM links WHERE doc_id % 3 = 0
""".strip(),
    doc="Per-page discovered-link batches appended into one frontier "
    "(reference: commands/extract.md:800-806): unionByName, duplicates kept "
    "(dedup is a separate explicit step, as in the reference).",
)
def q_union_link_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = syn.with_links_columns(_t(spark, sf_dir, "documents"))
    a = links.where("doc_id % 2 = 0").select("url")
    b = links.where("doc_id % 3 = 0").select("url")
    return a.unionByName(b)


@register(
    "dedup-queue-url",
    f"""
WITH {syn.LINKS_CTE},
frontier AS (
  SELECT url FROM links WHERE doc_id % 2 = 0
  UNION ALL
  SELECT url FROM links WHERE doc_id % 3 = 0
)
SELECT DISTINCT url FROM frontier
""".strip(),
    doc="Refuse double-enqueue of a URL (reference: crawler-queue.sh:36-41): "
    "distinct on the union of link batches.",
)
def q_dedup_queue_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_union_link_batches(spark, sf_dir).distinct()


@register(
    "window-page-id",
    """
WITH visited AS (SELECT doc_id, source FROM documents WHERE doc_id % 4 = 0)
SELECT doc_id,
       lpad(CAST(row_number() OVER (ORDER BY doc_id ASC) AS STRING), 3, '0') AS page_id
FROM visited
""".strip(),
    doc="Monotone page ids 001, 002… from the visited count "
    "(reference: crawler-queue.sh:172-176). Spark side uses two-pass "
    "partition-offset assignment (operators/ids.py) — no single-reducer "
    "global window; the ordered-window SQL stays as the oracle twin.",
)
def q_window_page_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    visited = _t(spark, sf_dir, "documents").where("doc_id % 4 = 0")
    numbered = ids.assign_sequential_ids(
        visited.select("doc_id"), ["doc_id"], id_col="__rn"
    )
    return numbered.select(
        "doc_id",
        F.lpad(F.col("__rn").cast("string"), 3, "0").alias("page_id"),
    )


_BATCH_LIMIT = 500_000

@register(
    "window-batch-assign",
    f"""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(floor(CAST(coalesce(
         sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         0) AS DOUBLE) / {_BATCH_LIMIT}) AS BIGINT) AS batch_id
FROM orders
""".strip(),
    doc="Greedy bin packing re-expressed as an exclusive prefix-sum window "
    "cut at the byte cap (reference: DESIGN.md:736-763; see "
    "operators/batching.py for the scale discussion). Packing is "
    "PARTITIONED by the session key (o_custkey — the crawl-session analog): "
    "each session packs independently on its own reducer, so the plan "
    "scales with sessions instead of funnelling all tasks through one "
    "window. batch_id is session-local. DECIMAL prefix sum keeps batch "
    "boundaries deterministic.",
)
def q_window_batch_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return batching.assign_batches(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        "o_totalprice",
        ["o_totalprice", "o_orderkey"],
        _BATCH_LIMIT,
        partition_cols=["o_custkey"],
    )


@register(
    "agg-batch-rollup",
    f"""
WITH assigned AS (
  SELECT o_custkey, o_totalprice,
         CAST(floor(CAST(coalesce(
           sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS DOUBLE) / {_BATCH_LIMIT}) AS BIGINT) AS batch_id
  FROM orders
)
SELECT o_custkey, batch_id, CAST(count(*) AS BIGINT) AS n_tasks,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS batch_bytes
FROM assigned GROUP BY o_custkey, batch_id
""".strip(),
    doc="Per-batch totalEstimatedSize rollup (reference: DESIGN.md:736-763), "
    "keyed by (session, batch) to match the partitioned packing.",
)
def q_agg_batch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = q_window_batch_assign(spark, sf_dir)
    return batching.batch_rollup(
        assigned, "o_totalprice", group_cols=["o_custkey"]
    ).select("o_custkey", "batch_id", "n_tasks", "batch_bytes")


# --- §2.F/H windows + scalar families ------------------------------------------------


@register(
    "plan-batches",
    f"""
WITH assigned AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(floor(CAST(coalesce(
           sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS DOUBLE) / {_BATCH_LIMIT}) AS BIGINT) AS batch_id
  FROM orders
),
rollup_t AS (
  SELECT o_custkey, batch_id, CAST(count(*) AS BIGINT) AS n_tasks,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS batch_bytes
  FROM assigned GROUP BY o_custkey, batch_id
)
SELECT a.o_orderkey, a.o_custkey, a.batch_id, r.n_tasks, r.batch_bytes
FROM assigned a
JOIN rollup_t r ON a.o_custkey = r.o_custkey AND a.batch_id = r.batch_id
""".strip(),
    doc="Full batch plan: every task with its batch assignment AND the "
    "batch's rollup totals (reference: DESIGN.md:729-763) — the planner's "
    "output table, composing window-batch-assign with agg-batch-rollup. "
    "Partitioned by session key end-to-end: packing window, rollup, and "
    "the re-join all share hash(o_custkey) partitioning.",
)
def q_plan_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = q_window_batch_assign(spark, sf_dir)
    rollup = batching.batch_rollup(
        assigned, "o_totalprice", group_cols=["o_custkey"]
    )
    return assigned.join(rollup, ["o_custkey", "batch_id"]).select(
        "o_orderkey", "o_custkey", "batch_id", "n_tasks", "batch_bytes"
    )


@register(
    "window-running-total",
    """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
FROM lineitem
""".strip(),
    doc="Aggregate-over-frame window (running pack totals, SURVEY §2.G "
    "coverage note). Explicit ROWS frame; the synthetic lineitem does NOT "
    "guarantee unique (l_orderkey, l_linenumber), so l_quantity is the "
    "final tiebreak — rows still tied after it are value-identical in "
    "every output column, making the result multiset order-independent "
    "(a tie with differing quantity surfaced as a real divergence in the "
    "10x scale sweep).",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            F.asc("l_shipdate"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
            F.asc("l_quantity"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(_dec("l_quantity")).over(w).cast("double").alias("running_qty"),
    )


@register(
    "window-rank-parts",
    """
SELECT p_brand, p_partkey, p_retailprice,
       CAST(row_number() OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice DESC, p_partkey ASC) AS INTEGER) AS rn
FROM part
""".strip(),
    doc="Ranking window representative (row_number per group, SURVEY §2.G).",
)
def q_window_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return _t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.row_number().over(w).cast("int").alias("rn"),
    )


@register(
    "window-lag-lead",
    """
SELECT o_custkey, o_orderkey,
       CAST(datediff('day',
            CAST(lag(o_orderdate) OVER w AS DATE),
            CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
       lead(o_orderstatus) OVER w AS next_status,
       CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
            AS INTEGER) AS price_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""".strip(),
    doc="Offset window functions: inter-order gap (lag), next status "
    "(lead), per-customer price quartile (ntile) — the reorder-interval "
    "analytics shape (SURVEY §2.G window coverage).",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    wq = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("int")
        .alias("days_since_prev"),
        F.lead("o_orderstatus").over(w).alias("next_status"),
        F.ntile(4).over(wq).cast("int").alias("price_quartile"),
    )


@register(
    "setop-intersect",
    f"""
WITH {syn.LINKS_CTE}, {syn.VISITED_CTE}
SELECT url FROM links
INTERSECT
SELECT url FROM visited
""".strip(),
    doc="Set intersection frontier ∩ visited (SURVEY §2.G coverage note: "
    "intersect is a Spark built-in; the complement of dedup-visited).",
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    links = syn.with_links_columns(docs).select("url")
    return links.intersect(syn.visited_urls(docs))


def _pctl_term(p: float, alias: str) -> str:
    # continuous percentile at (n-1)*p via the two bracketing ranks; at most
    # two nonzero terms enter the sum, so float addition order can't vary
    # and the result is bit-identical across engines — deliberately NOT
    # rounded: round() itself differs between engines at half-way points
    return (
        f"sum(CASE WHEN rn = CAST(floor((n-1) * {p}) AS BIGINT)"
        f" THEN v * (1 - ((n-1) * {p} - floor((n-1) * {p})))"
        f" WHEN rn = CAST(floor((n-1) * {p}) AS BIGINT) + 1"
        f" THEN v * ((n-1) * {p} - floor((n-1) * {p}))"
        f" ELSE 0 END) AS {alias}"
    )


# dialect-common: executed verbatim by BOTH Spark SQL and DuckDB — built-in
# percentile functions interpolate slightly differently between engines, so
# the formula is stated once instead of trusting two implementations
PCTL_SQL = f"""
WITH ranked AS (
  SELECT l_returnflag AS g, l_extendedprice AS v,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice ASC) - 1 AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT g AS l_returnflag,
       {_pctl_term(0.5, "p50")},
       {_pctl_term(0.9, "p90")},
       {_pctl_term(0.99, "p99")}
FROM ranked GROUP BY g
""".strip()


@register(
    "agg-percentiles",
    PCTL_SQL,
    doc="Exact interpolated percentiles per group, formula stated once in "
    "dialect-common SQL (built-in percentile/quantile_cont interpolate "
    "differently across engines). At 100 TB switch to approx_percentile's "
    "t-digest — a full sort per group is the exactness price.",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # through the CACHED view registry, not a private
    # createOrReplaceTempView: a private writer would leave the shared
    # cache's last-registered bookkeeping stale across sf_dir switches
    from ai_knowledge_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(PCTL_SQL)


@register(
    "scalar-date-math",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(datediff('day', CAST('1995-01-01' AS DATE), CAST(o_orderdate AS DATE)) AS INTEGER)
         AS days_since_epoch_base
FROM orders
""".strip(),
    doc="Date/time scalar family (SURVEY §2.H): extraction, interval "
    "arithmetic, day difference. Spark date_add == DuckDB + INTERVAL, "
    "datediff argument orders differ between dialects — normalized here.",
)
def q_scalar_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_base"),
    )


@register(
    "scalar-json-extract",
    """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
FROM events WHERE event_type = 'purchase'
""".strip(),
    doc="JSON scalar family over events.props (SURVEY §2.H json; the "
    "reference keeps queue/visited/links state as JSON blobs, "
    "crawler-coordinator.md:111-176).",
)
def q_scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_num"),
    )


@register(
    "scalar-array-ops",
    """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       embedding[1] AS first_val,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 3) AS l2_norm
FROM embeddings
""".strip(),
    doc="Array scalar family (SURVEY §2.H): size, element access, "
    "higher-order transform+aggregate (L2 norm). Sequential fold over the "
    "list → same summation order in both engines; rounded to absorb the "
    "last float bit.",
)
def q_scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.round(F.sqrt(sq_sum), 3).alias("l2_norm"),
    )


@register(
    "scalar-string-suite",
    """
SELECT doc_id,
       upper(substring(source, 1, 3)) AS src_upper,
       reverse(source) AS src_rev,
       repeat(substring(source, 1, 2), 3) AS src_rep,
       lpad(source, 8, '.') AS src_pad,
       replace(source, 'src', 'origin_') AS src_repl,
       CAST(strpos(text, 'spark') AS INTEGER) AS first_spark,
       translate(source, 'src', 'SRC') AS src_trans
FROM documents
""".strip(),
    doc="String scalar family (SURVEY §2.H): case, reverse, repeat, pad, "
    "replace, find, translate. Spark instr == DuckDB strpos (1-based, 0 on "
    "miss).",
)
def q_scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("source", 1, 3)).alias("src_upper"),
        F.reverse("source").alias("src_rev"),
        F.repeat(F.substring("source", 1, 2), 3).alias("src_rep"),
        F.lpad("source", 8, ".").alias("src_pad"),
        F.replace(F.col("source"), F.lit("src"), F.lit("origin_")).alias(
            "src_repl"
        ),
        F.instr("text", "spark").cast("int").alias("first_spark"),
        F.translate("source", "src", "SRC").alias("src_trans"),
    )


@register(
    "scalar-map-ops",
    """
SELECT event_id,
       array_to_string(json_keys(props), ',') AS prop_keys,
       (json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys
FROM events WHERE event_type = 'view'
""".strip(),
    doc="Map scalar family (SURVEY §2.H map): JSON props → MapType → "
    "map_keys / membership / cardinality (the visited.json url-map shape, "
    "crawler-coordinator.md:146-158).",
)
def q_scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "view"
    )
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("prop_keys"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


@register(
    "scalar-math-suite",
    """
SELECT doc_id,
       CAST(ceil(n_chars / 1000.0) AS BIGINT) AS est_chunks,
       CAST(floor(n_chars / 1000.0) AS BIGINT) AS full_chunks,
       CAST(greatest(least(n_chars, 300), 100) AS BIGINT) AS clamped,
       round(100.0 * (1.0 - least(n_chars, 300) / CAST(n_chars AS DOUBLE)), 2) AS reduction_pct
FROM documents
""".strip(),
    doc="Math scalar family (SURVEY §2.H): chunk-count ceil "
    "(reference: DESIGN.md:702), clamps, compression reduction % "
    "(reference: compress-image.mjs:83). Per-row IEEE arithmetic is "
    "bit-identical across engines, so rounding here is safe.",
)
def q_scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n = F.col("n_chars")
    return d.select(
        "doc_id",
        F.ceil(n / 1000.0).cast("bigint").alias("est_chunks"),
        F.floor(n / 1000.0).cast("bigint").alias("full_chunks"),
        F.greatest(F.least(n, F.lit(300)), F.lit(100))
        .cast("bigint")
        .alias("clamped"),
        F.round(
            100.0 * (1.0 - F.least(n, F.lit(300)) / n.cast("double")), 2
        ).alias("reduction_pct"),
    )


# --- TPC-H depth pass 2: distribution / correlated / disjunctive shapes ---------


@register(
    "agg-orders-per-customer",
    """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_custs
FROM per_cust GROUP BY n_orders
""".strip(),
    doc="TPC-H-Q13 shape: order-count distribution — LEFT OUTER join with a "
    "join-side predicate (which must NOT become a WHERE, or zero-order "
    "customers vanish), then a second aggregation over the first's result. "
    "The outer join preserves customers with no orders as n_orders=0.",
)
def q_agg_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_custs")
    )


@register(
    "join-small-qty-revenue",
    """
WITH avg_qty AS (
  SELECT l_partkey, avg(l_quantity) AS aq FROM lineitem GROUP BY l_partkey
)
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
            AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND l.l_quantity < 0.5 * a.aq
""".strip(),
    doc="TPC-H-Q17 shape: correlated per-part average decorrelated into a "
    "grouped subquery + equi-join — each lineitem compares against its own "
    "part's mean quantity. At scale the avg_qty side is small (one row per "
    "part) and broadcastable; the brand filter prunes the part join first.",
)
def q_join_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("aq")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.ak)
        .where(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            (F.round(F.sum(_dec("l_extendedprice")) / 7.0, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "filter-disjunctive-pushdown",
    """
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""".strip(),
    doc="TPC-H-Q19 shape: three-way disjunction mixing fact and dimension "
    "predicates. Catalyst extracts the common p/l conjuncts per branch and "
    "pushes the part-only OR (brand+size) below the join into the parquet "
    "scan, so only candidate parts are joined — verify via PushedFilters.",
)
def q_filter_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    br = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return j.where(br).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "join-waiting-supplier",
    """
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F' AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
),
multi AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1
),
sole_late AS (
  SELECT l_orderkey FROM late
  GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) = 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late t
JOIN multi m ON m.l_orderkey = t.l_orderkey
JOIN sole_late sl ON sl.l_orderkey = t.l_orderkey
JOIN supplier s ON s.s_suppkey = t.l_suppkey
GROUP BY s.s_name
""".strip(),
    doc="TPC-H-Q21 shape: suppliers solely responsible for late multi-"
    "supplier orders. The classic EXISTS/NOT-EXISTS pair over lineitem "
    "self-joins is decorrelated into two grouped order-level predicates "
    "(>1 supplier participated; exactly 1 shipped late) joined back — "
    "turning two correlated scans into one shuffle each. Spark plan "
    "(round 5): ALL THREE order-level predicates fuse into ONE hash "
    "aggregate over lineitem-join-orders — collect_set(supplier) and "
    "collect_set(late supplier) per order (when() nulls drop out of "
    "collect_set; sets are bounded by basket size, so no Expand and no "
    "double-distinct rewrite), then size(all)>1 AND size(late)=1 picks "
    "the sole late supplier as the set's only element. One exchange on "
    "the order key plus the tiny supplier-name agg replaces the "
    "textbook plan's four-plus. Lateness is shipdate > orderdate+60d "
    "(this schema has no commit/receipt dates; reference: crawl "
    "scheduling uses the same overdue-by-threshold shape).",
)
def q_join_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    s = _t(spark, sf_dir, "supplier")
    is_late = (F.col("o_orderstatus") == "F") & (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    )
    per_order = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.collect_set("l_suppkey").alias("all_supps"),
            F.collect_set(
                F.when(is_late, F.col("l_suppkey"))
            ).alias("late_supps"),
        )
        .where(
            (F.size("all_supps") > 1) & (F.size("late_supps") == 1)
        )
        .select(F.element_at("late_supps", 1).alias("late_supp"))
    )
    return (
        per_order.join(
            F.broadcast(s), per_order.late_supp == s.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "join-global-avg-anti",
    """
WITH rich AS (
  SELECT c_custkey, c_acctbal, substr(c_name, 16, 3) AS cseg
  FROM customer
  WHERE c_acctbal > (
    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
  )
)
SELECT r.cseg, CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(r.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM rich r
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = r.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY r.cseg
""".strip(),
    doc="TPC-H-Q22 shape: global scalar-average threshold + anti join "
    "(above-average-balance customers who never placed an URGENT order), "
    "grouped by a name-derived segment (stand-in for phone country code). "
    "The scalar subquery is one tiny aggregate broadcast into the filter; "
    "the NOT EXISTS is a left_anti against a filtered orders projection — "
    "the priority predicate pushes into the parquet scan of the anti side.",
)
def q_join_global_avg_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
        .first()["a"]
    )
    avg_bal = 0.0 if avg_bal is None else avg_bal  # empty table: nobody rich
    rich = c.where(F.col("c_acctbal") > float(avg_bal)).select(
        "c_custkey",
        "c_acctbal",
        F.substring("c_name", 16, 3).alias("cseg"),
    )
    no_orders = rich.join(
        o.where(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("c_custkey")
        ),
        "c_custkey",
        "left_anti",
    )
    return no_orders.groupBy("cseg").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
    )


# --- TPC-H depth, round-1 wave 3: Q8/Q9/Q12/Q14/Q15 shapes ----------------------


@register(
    "agg-market-share",
    """
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
       {RR_SHARE} AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN region r ON n2.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND p.p_name LIKE '%widget%'
GROUP BY year(o.o_orderdate)
""".strip().replace(
        "{RR_SHARE}",
        parity.round_ratio_duck(
            """sum(CASE WHEN n1.n_name = 'NATION_3'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                  ELSE 0 END) * 10000""",
            """sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) * 10000""",
            4,
        ),
    ),
    doc="TPC-H-Q8 shape (market share): one supplier nation's revenue "
    "share among one region's customers for one part family, per order "
    "year. Five of the seven joins broadcast (part/supplier/nation x2/"
    "customer/region dims); only lineitem JOIN orders shuffles. The "
    "share is a conditional-sum / sum ratio in one aggregate pass — "
    "rounded in cross-multiplied integer arithmetic (functions/parity): "
    "the ratio of two exact 4dp-decimal sums is a finite decimal, so "
    "engine round() is tie-unsafe across engines (the round-7 tie class; "
    "residual risk here was ~1e-5 per group, closed for free).",
)
def q_agg_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2"))
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    joined = (
        li.join(F.broadcast(p.where(F.col("p_name").like("%widget%"))),
                li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
              F.col("rk2") == F.col("r_regionkey"))
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    g = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(
        (F.sum(nation_rev) * 10000).cast("decimal(38,0)").alias("num4"),
        (F.sum(rev) * 10000).cast("decimal(38,0)").alias("den4"),
    )
    return g.select(
        "order_year",
        parity.round_ratio_spark("num4", "den4", 4).alias("mkt_share"),
    )


@register(
    "agg-nation-profit",
    """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, year(o.o_orderdate)
""".strip(),
    doc="TPC-H-Q9 shape (product-line profit by nation and year; the "
    "fixture set has no partsupp, so profit = discounted revenue). The "
    "LIKE filter prunes part BEFORE the broadcast, so the lineitem "
    "probe drops non-matching rows at the first join — the one shuffle "
    "join (orders) only sees surviving rows.",
)
def q_agg_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.sum(rev).cast("double").alias("sum_profit"))
    )


@register(
    "agg-ship-latency-case",
    """
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90 THEN 'late'
            WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 30 THEN 'slow'
            ELSE 'fast' END AS latency_band,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""".strip(),
    doc="TPC-H-Q12 shape (the fixture lineitem has no shipmode/commit/"
    "receipt dates, so the band is ship latency = shipdate - orderdate): "
    "group by a derived lineitem band, CASE-count order priorities. One "
    "shuffle join + one partial-aggregated hash agg on 3 groups.",
)
def q_agg_ship_latency_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lat = F.datediff("l_shipdate", "o_orderdate")
    band = (
        F.when(lat > 90, "late").when(lat > 30, "slow").otherwise("fast")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(band.alias("latency_band"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "agg-promo-revenue",
    """
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       {RR_PROMO} AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY year(l_shipdate)
""".strip().replace(
        "{RR_PROMO}",
        parity.round_ratio_duck(
            """sum(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                  ELSE 0 END) * 1000000""",
            """sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) * 10000""",
            4,
        ),
    ),
    doc="TPC-H-Q14 shape (promo revenue share, per ship year instead of "
    "one month so every year contributes a row): conditional-sum ratio "
    "over a single broadcast join — no shuffle except the 200-row dim "
    "broadcast and the tiny final agg. The 100*promo/total percentage "
    "is rounded in cross-multiplied integer arithmetic (functions/"
    "parity, round-7 tie class): numerator scaled 100x extra so the "
    "exact ratio already carries the percent factor.",
)
def q_agg_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    g = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            (F.sum(promo) * 1000000).cast("decimal(38,0)").alias("num6"),
            (F.sum(rev) * 10000).cast("decimal(38,0)").alias("den4"),
        )
    )
    return g.select(
        "ship_year",
        parity.round_ratio_spark("num6", "den4", 4).alias(
            "promo_revenue_pct"
        ),
    )


@register(
    "topk-supplier-revenue",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""".strip(),
    doc="TPC-H-Q15 shape (top supplier): revenue view over one ship "
    "half-year, then equality against the view's own max — tie-safe by "
    "construction (every argmax row returns). The view computes once: "
    "Spark reuses the aggregated frame for both the max and the join.",
)
def q_topk_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
    )
    # scalar subquery as a broadcast 1-row join (NOT a global window,
    # which would drag the whole view onto one partition)
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    top = revenue.join(
        F.broadcast(mx), revenue.total_revenue == mx["__mx"]
    ).drop("__mx")
    return (
        F.broadcast(s)
        .join(top, s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- temporal joins + histogram -------------------------------------------------


@register(
    "join-asof-last-purchase",
    """
WITH clicks AS (
  SELECT event_id, user_id, epoch_ns(ts) AS tns
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, epoch_ns(ts) AS tns, value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
       CAST(c.tns // 1000000000 AS BIGINT) AS click_s,
       p.value AS last_purchase_value,
       CAST((c.tns - p.tns) // 1000000000 AS BIGINT) AS lag_s
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.tns >= p.tns
""".strip(),
    doc="As-of (point-in-time) join: each click gets the user's latest "
    "purchase at-or-before it. Spark has no asof primitive; "
    "operators/asof.py does union-and-LOCF — one key-partitioned window "
    "pass, no range-join row explosion (the oracle uses DuckDB's native "
    "ASOF JOIN, so the two independent formulations cross-check).",
)
def q_join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import asof

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("tns")
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("rtns"), "value"
    )
    j = asof.asof_join(
        clicks, purch, on="user_id", left_ts="tns", right_ts="rtns",
        value_cols=["value"],
    )
    return j.select(
        "event_id",
        "user_id",
        F.expr("tns div 1000000000").alias("click_s"),
        F.col("asof_value").alias("last_purchase_value"),
        F.expr("(tns - asof_ts) div 1000000000").alias("lag_s"),
    )


@register(
    "join-range-window",
    """
WITH err AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS sec
  FROM events WHERE event_type = 'error'
),
clk AS (
  SELECT user_id, epoch_ns(ts) // 1000000000 AS sec
  FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, CAST(e.sec AS BIGINT) AS err_s,
       CAST(count(c.sec) AS BIGINT) AS clicks_within_60s
FROM err e LEFT JOIN clk c
  ON e.user_id = c.user_id AND c.sec >= e.sec AND c.sec < e.sec + 60
GROUP BY e.event_id, e.user_id, e.sec
""".strip(),
    doc="Range (interval) join: clicks within 60 s after each error, per "
    "user. Spark side buckets both sides into 60 s bands and equi-joins "
    "on (user, band) twice (band, band+1) before the residual range "
    "filter — bounded fan-out instead of a per-key cross product, the "
    "standard banded-range-join rewrite Catalyst doesn't do itself.",
)
def q_join_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sec = F.expr("ts div 1000000000")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", sec.alias("err_sec")
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), sec.alias("clk_sec")
    )
    band = lambda c: F.floor(c / 60)  # noqa: E731
    clk_b = clk.withColumn("band", band(F.col("clk_sec")))
    # an error's 60 s look-ahead spans at most 2 bands
    err_b = err.withColumn(
        "band", F.explode(F.array(band(F.col("err_sec")), band(F.col("err_sec")) + 1))
    )
    hits = (
        err_b.join(
            clk_b,
            (err_b.user_id == clk_b.cu)
            & (err_b.band == clk_b.band)
            & (clk_b.clk_sec >= err_b.err_sec)
            & (clk_b.clk_sec < err_b.err_sec + 60),
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        err.join(hits, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.col("err_sec").cast("long").alias("err_s"),
            F.coalesce("n_hits", F.lit(0)).cast("long")
            .alias("clicks_within_60s"),
        )
    )


@register(
    "agg-histogram",
    """
SELECT CAST(least(floor(value / 50), 9) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
""".strip(),
    doc="Fixed-width histogram over events.value (10 bins of 50, last bin "
    "open-ended): one partial-aggregated hash agg on a derived key — the "
    "shape every monitoring rollup uses; bins are data-independent so "
    "map-side combine collapses each partition to <=10 rows before the "
    "shuffle.",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("int")
    return ev.groupBy(bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        .alias("sum_value"),
    )


# --- pure-SQL surface: one dialect-common string, two engines -------------------

# Revenue in EXACT integer ten-thousandths-of-a-unit: cents × (100 −
# discount_cents) sums in BIGINT (max ≈ 6e14 at sf0.1, far under 2^63),
# then ONE int→double conversion and one /10000.0 — bit-identical in
# both engines since they execute the same string. The round(x*100)
# reconstructions cannot tie (a 2-decimal value × 100 sits within float
# error of an integer, never near .5). The DECIMAL(18,2) form this
# replaced paid Spark's 128-bit decimal sum machinery per row — the
# BIGINT-cents rewrite (the mad-outliers lesson) reads 1.48 → 0.87 s
# warm at sf0.1 with values identical at display precision. The per-row
# PRODUCT stays BIGINT (≤1e9, exact at any scale) but the ACCUMULATOR is
# pre-widened to DECIMAL(38,0) (r8 ADVICE): a plain-BIGINT sum wraps
# silently in Spark around sf~9000 (9.2e18/1e9 ≈ 9e9 rows/group) while
# DuckDB promotes sum(BIGINT) to HUGEINT — same string, both engines,
# both exact.
_REVENUE_BY_REGION_SQL = """
SELECT r.r_name AS region, CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
       CAST(sum(CAST(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                AS DECIMAL(38,0)))
            AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, year(o.o_orderdate)
""".strip()


@register(
    "sql-revenue-by-region",
    _REVENUE_BY_REGION_SQL,
    doc="The SQL API surface: the SAME dialect-common string runs through "
    "spark.sql over registered temp views AND through DuckDB as its own "
    "oracle — proving a user can bring plain ANSI SQL to this engine and "
    "Catalyst plans it (broadcasts the three dim joins, shuffles only "
    "lineitem JOIN orders) with zero DataFrame code.",
)
def q_sql_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_REVENUE_BY_REGION_SQL)


# Final-stage double arithmetic shared VERBATIM by the Spark selectExpr and
# the DuckDB oracle: identical expression trees over identical (exact
# BIGINT-partial-derived) inputs make the floats bit-identical, so the
# differential needs only display rounding, not tolerance bands.
def _split_top_level(exprs: str) -> list[str]:
    """Split a comma-joined projection list on TOP-LEVEL commas only
    (commas inside round(x, 4) etc. must not split)."""
    out, depth, cur = [], 0, []
    for ch in exprs:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


_REGR_FINAL = """
  event_type,
  CAST(n AS BIGINT) AS n_days,
  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS slope,
  round((CAST(sy AS DOUBLE)
         - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
           * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 2) AS intercept
""".strip()


@register(
    "agg-regression-trend",
    f"""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, day
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(day) AS BIGINT) AS sx,
         CAST(sum(cents) AS BIGINT) AS sy,
         CAST(sum(day * cents) AS BIGINT) AS sxy,
         CAST(sum(day * day) AS BIGINT) AS sxx
  FROM daily GROUP BY event_type
  HAVING count(*) > 1
)
SELECT {_REGR_FINAL}
FROM m
""".strip(),
    doc="Per-segment least-squares trend (daily revenue vs day index) "
    "from EXACT integer moments: two hash aggregates produce BIGINT "
    "(n, Σx, Σy, Σxy, Σx²) — associative partials, so the result is "
    "partitioning-invariant, which a native double-accumulating "
    "regr_slope is NOT — and the closing slope/intercept arithmetic is "
    "one shared expression string evaluated by both engines on "
    "identical inputs (bit-identical doubles, display rounding only). "
    "Scale: the daily rollup is bounded by the calendar (O(days x "
    "segments) rows), so the second aggregate is trivially small; "
    "moments are cast to DOUBLE before the closing products to stay "
    "overflow-free at any corpus size. Degenerate segments (a single "
    "distinct day) are excluded IDENTICALLY in both engines via "
    "HAVING n > 1 — the slope denominator n*sxx - sx² is then always "
    "positive (x values are distinct by construction), where a 0 "
    "denominator would yield NULL in Spark's non-ANSI division but "
    "inf/nan in DuckDB's IEEE mode.",
)
def q_agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("ts div 1000000000 div 86400").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("day").cast("long").alias("sx"),
        F.sum("cents").cast("long").alias("sy"),
        F.sum(F.col("day") * F.col("cents")).cast("long").alias("sxy"),
        F.sum(F.col("day") * F.col("day")).cast("long").alias("sxx"),
    )
    # mirror the oracle's HAVING count(*) > 1: single-day segments have a
    # zero slope denominator (NULL in Spark non-ANSI, inf/nan in DuckDB)
    return m.where(F.col("n") > 1).selectExpr(
        *_split_top_level(_REGR_FINAL)
    )


_WELCH_FINAL = """
  CAST(na AS BIGINT) AS n_a,
  CAST(nb AS BIGINT) AS n_b,
  round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 2) AS mean_a,
  round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 2) AS mean_b,
  round((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
         - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
        / sqrt(((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE)
                 * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                / (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)
               + ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE)
                   * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                  / (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE)),
        4) AS t_stat
""".strip()

# Degenerate-arm guard, shared verbatim by both engines: an empty or
# size-1 arm zeroes a variance denominator, and two zero-variance arms
# zero the t denominator — Spark's non-ANSI double division returns NULL
# there while DuckDB's IEEE mode returns inf/nan, so such inputs must be
# excluded IDENTICALLY on both sides. Zero variance is detected exactly:
# n*Σx² == (Σx)² over 128-bit DECIMAL products (no int64 wrap, no FP
# boundary drift).
_WELCH_GUARD = """
na > 1 AND nb > 1
AND (CAST(ssa AS DECIMAL(38,0)) * na <> CAST(sa AS DECIMAL(38,0)) * sa
     OR CAST(ssb AS DECIMAL(38,0)) * nb <> CAST(sb AS DECIMAL(38,0)) * sb)
""".strip()


@register(
    "agg-welch-ttest",
    f"""
WITH g AS (
  SELECT
    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS na,
    CAST(sum(CAST(round(value * 100) AS BIGINT))
         FILTER (WHERE event_type = 'purchase') AS BIGINT) AS sa,
    sum(CAST(CAST(round(value * 100) AS BIGINT)
             * CAST(round(value * 100) AS BIGINT) AS DECIMAL(38,0)))
         FILTER (WHERE event_type = 'purchase') AS ssa,
    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS nb,
    CAST(sum(CAST(round(value * 100) AS BIGINT))
         FILTER (WHERE event_type = 'click') AS BIGINT) AS sb,
    sum(CAST(CAST(round(value * 100) AS BIGINT)
             * CAST(round(value * 100) AS BIGINT) AS DECIMAL(38,0)))
         FILTER (WHERE event_type = 'click') AS ssb
  FROM events
)
SELECT {_WELCH_FINAL}
FROM g
WHERE {_WELCH_GUARD}
""".strip(),
    doc="Welch two-sample t statistic (A/B experiment readout: purchase "
    "vs click value) from exact integer moments — one conditional hash "
    "aggregate produces BIGINT (n, Σ, Σ²) per arm (map-side combine, "
    "single 1-row reduce), and the t arithmetic is one expression "
    "string shared verbatim with the oracle, so the doubles are "
    "bit-identical and only display rounding is applied. Scale: the "
    "moments are the only state — O(1) per partition regardless of "
    "corpus size; cast to DOUBLE before the closing products so s² "
    "cannot overflow int64 at petabyte row counts. Degenerate inputs "
    "(an arm with <2 rows, or both arms zero-variance) are excluded by "
    "_WELCH_GUARD — one condition string shared verbatim by both "
    "engines, exact 128-bit integer arithmetic — because Spark "
    "non-ANSI and DuckDB IEEE disagree on x/0.0 (NULL vs inf/nan).",
)
def q_agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    is_a = F.col("event_type") == "purchase"
    is_b = F.col("event_type") == "click"
    g = ev.agg(
        F.count(F.when(is_a, 1)).cast("long").alias("na"),
        F.sum(F.when(is_a, F.col("cents"))).cast("long").alias("sa"),
        # squared-cents accumulator widened to DECIMAL(38,0) (r9 overflow
        # audit): the two arms are GLOBAL groups, so a BIGINT sum wraps
        # around 2.9e9 rows/arm (value≤560 → cents²≤3.2e9) — and value is
        # unbounded in principle. Per-row product stays BIGINT (exact for
        # value ≤ 3e7).
        F.sum(F.when(is_a, (F.col("cents") * F.col("cents")).cast(
            "decimal(38,0)"
        ))).alias("ssa"),
        F.count(F.when(is_b, 1)).cast("long").alias("nb"),
        F.sum(F.when(is_b, F.col("cents"))).cast("long").alias("sb"),
        F.sum(F.when(is_b, (F.col("cents") * F.col("cents")).cast(
            "decimal(38,0)"
        ))).alias("ssb"),
    )
    return g.where(F.expr(_WELCH_GUARD)).selectExpr(
        *_split_top_level(_WELCH_FINAL)
    )


@register(
    "sql-parameterized",
    """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_totalprice > 200000.0 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
""".strip(),
    doc="Parameterized SQL API surface (spark.sql(query, args={...}), "
    "Spark 3.4+): named :placeholders bound server-side as literal "
    "expressions — injection-proof user-facing SQL without string "
    "interpolation, and Catalyst still constant-folds the bound values "
    "into pushed-down scan filters exactly as if they were inline "
    "literals. The oracle inlines the same values; an API-coverage "
    "entry like udtf-lateral-chunks.",
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS total_price
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 200000.0, "status": "F"},
    )


@register(
    "agg-activity-streaks",
    """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day
  FROM events
),
grouped AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
  FROM grouped GROUP BY user_id, grp
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM streaks GROUP BY user_id
""".strip(),
    doc="Gaps-and-islands: each user's longest run of CONSECUTIVE "
    "active days — the classic streak detection that needs no "
    "self-join: day minus its per-user rank is constant within an "
    "island, so one partitioned row_number window plus two hash "
    "aggregates finds every streak. Scale: the window partitions by "
    "user over the calendar-bounded distinct-day frame (O(days) rows "
    "per user, not O(events)); everything downstream is tiny.",
)
def q_agg_activity_streaks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("ts div 1000000000 div 86400").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grouped = days.select(
        "user_id",
        "day",
        (F.col("day") - F.row_number().over(w)).alias("grp"),
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
    )


@register(
    "agg-user-paths-topk",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
)
SELECT event_type || '>' || t1 || '>' || t2 AS path,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE t2 IS NOT NULL
GROUP BY path
ORDER BY n DESC, path
LIMIT 20
""".strip(),
    doc="Top-k 3-step behavioral paths (sequence n-gram mining over "
    "per-user event streams — the clickstream-analysis staple): two "
    "lead() offsets over one shared (user, time, event_id-tiebreak) "
    "window produce each consecutive event triple, then a hash "
    "aggregate over the O(|types|^3)-bounded path space and a "
    "TakeOrderedAndProject with a path tiebreak for a deterministic "
    "cut. Scale: one shuffle on user_id for the window (per-user "
    "frames bounded by session length), map-side combine on the tiny "
    "path key space; deeper paths grow the key space geometrically — "
    "prune with a minimum-support pre-filter (apriori) before "
    "lengthening.",
)
def q_agg_user_paths_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).where(F.col("t2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


_EWMA_FINAL = """
  event_type, day, cents,
  round(pow(0.7, idx) * y0
        + 0.3 * pow(0.7, idx) * (cu - y0), 2) AS ewma
""".strip()


@register(
    "agg-ewma-daily",
    f"""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, day
),
idxd AS (
  SELECT event_type, day, cents,
         CAST(row_number() OVER w - 1 AS BIGINT) AS idx,
         CAST(cents AS DOUBLE) * pow(1.0 / 0.7,
           CAST(row_number() OVER w - 1 AS BIGINT)) AS u
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
accum AS (
  SELECT event_type, day, cents, idx,
         sum(u) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cu,
         first_value(CAST(cents AS DOUBLE)) OVER (
           PARTITION BY event_type ORDER BY day) AS y0
  FROM idxd
)
SELECT {_EWMA_FINAL}
FROM accum
""".strip(),
    doc="Exponentially weighted moving average of daily revenue per "
    "segment (alpha=0.3) — the sequential recurrence s_t = a*y_t + "
    "(1-a)*s_(t-1) re-expressed CLOSED-FORM as one ordered cumulative "
    "window: s_t = r^t*y_0 + a*r^t*(sum of y_i*r^(-i) for i<=t, minus "
    "y_0), so no driver loop and no iterative state. The closing "
    "arithmetic is one expression string evaluated verbatim by both "
    "engines over an identically-ordered running sum — bit-identical "
    "doubles, display rounding only. Scale: windows partition by "
    "segment over the CALENDAR-bounded daily rollup (O(days) rows per "
    "partition); the r^(-i) rescaling is numerically valid to ~500 "
    "steps at r=0.7 — segment longer series into rescaled epochs, the "
    "standard trick for windowed geometric reweighting.",
)
def q_agg_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("ts div 1000000000 div 86400").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    idx = (F.row_number().over(w) - 1).cast("long")
    idxd = daily.select(
        "event_type",
        "day",
        "cents",
        idx.alias("idx"),
        (
            F.col("cents").cast("double")
            * F.pow(F.lit(1.0 / 0.7), idx)
        ).alias("u"),
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    accum = idxd.select(
        "event_type",
        "day",
        "cents",
        "idx",
        F.sum("u").over(wcum).alias("cu"),
        F.first(F.col("cents").cast("double"))
        .over(W.partitionBy("event_type").orderBy("day"))
        .alias("y0"),
    )
    return accum.selectExpr(*_split_top_level(_EWMA_FINAL))


@register(
    "agg-markov-transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id
           ORDER BY epoch_ns(ts), event_id) AS to_type
  FROM events
)
SELECT event_type AS from_type, to_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(floor(count(*) * 1000000.0 /
                  sum(count(*)) OVER (PARTITION BY event_type))
            AS BIGINT) AS p_ppm
FROM seq WHERE to_type IS NOT NULL
GROUP BY event_type, to_type
""".strip(),
    doc="First-order Markov transition matrix over per-user event "
    "sequences (the next-action model behind funnel/recommendation "
    "analytics): lead() over (user, time, event_id-tiebreak) pairs each "
    "event with its successor, then one hash aggregate counts "
    "(from, to) transitions and a row-count-bounded window (|types|^2 "
    "frame) normalizes to integer ppm via floor of a bit-identical "
    "double ratio. Scale: the sequence window partitions by user_id "
    "(bounded per-user frames, shuffle on the user key); the transition "
    "matrix itself is O(|event types|^2) rows — tiny at any corpus "
    "size. The deterministic (ts, event_id) ordering makes lead() "
    "engine-portable even under duplicate timestamps.",
)
def q_agg_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), "to_type"
    ).agg(F.count("*").cast("long").alias("n"))
    wt = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.floor(
            F.col("n") * 1000000.0 / F.sum("n").over(wt)
        ).cast("long").alias("p_ppm"),
    )


@register(
    "agg-retention-cohorts",
    """
WITH days AS (
  SELECT user_id,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day
  FROM events
),
cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, day FROM days)
SELECT c.cohort_day,
       CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN cohort c ON a.user_id = c.user_id
WHERE a.day - c.cohort_day <= 14
GROUP BY c.cohort_day, a.day - c.cohort_day
""".strip(),
    doc="Retention cohort analysis: users grouped by first-seen day, "
    "counted at each day offset for two weeks — the canonical "
    "product-analytics rollup. Two aggs + one equi-join, all on user_id, "
    "so one partitioning serves every stage; the cohort side is tiny "
    "(one row per user) and broadcastable at any scale where users << "
    "events.",
)
def q_agg_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("ts div 1000000000 div 86400").alias("day")
    )
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = days.distinct()
    return (
        activity.join(cohort, "user_id")
        .where(F.col("day") - F.col("cohort_day") <= 14)
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@register(
    "agg-top-event-per-user",
    """
SELECT user_id,
       arg_max(event_id,
               CAST(round(value * 100) AS BIGINT) * 10000000 + event_id)
         AS top_event_id,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM events
GROUP BY user_id
""".strip(),
    doc="Single-pass argmax per group (Spark max_by == DuckDB arg_max): "
    "the highest-value event per user WITHOUT a window+filter — one "
    "partial-aggregating hash agg instead of a sort. The ordering key "
    "folds event_id into the cents value so ties resolve identically in "
    "both engines (argmax on ties is otherwise engine-defined).",
)
def q_agg_top_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    key = cents * 10000000 + F.col("event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", key).alias("top_event_id"),
        F.max(cents).cast("long").alias("max_cents"),
    )


@register(
    "window-rank-suite",
    """
SELECT event_id, user_id,
       CAST(dense_rank() OVER w AS INTEGER) AS drank,
       round(percent_rank() OVER w, 6) AS prank,
       round(cume_dist() OVER w, 6) AS cdist
FROM (SELECT event_id, user_id, value FROM events WHERE event_id < 2000)
WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
""".strip(),
    doc="Ranking-window completeness: dense_rank / percent_rank / "
    "cume_dist over one shared per-user window (unique (value, event_id) "
    "ordering so ranks are engine-stable). One shuffle, one sort, three "
    "rank functions evaluated in the same WindowExec pass.",
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where("event_id < 2000")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.dense_rank().over(w).cast("int").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "agg-variance-corr-exact",
    """
WITH cents AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS v,
         CAST(epoch_ns(ts) // 1000000000 % 86400 AS BIGINT) AS s
  FROM events
),
mom AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(s * s) AS BIGINT) AS sss,
         CAST(sum(v * s) AS BIGINT) AS svs
  FROM cents GROUP BY user_id
)
SELECT user_id, n,
       round((svv - CAST(sv AS DOUBLE) * sv / n) / (n - 1), 4) AS var_cents,
       round((svs - CAST(sv AS DOUBLE) * ss / n)
             / sqrt((svv - CAST(sv AS DOUBLE) * sv / n)
                    * (sss - CAST(ss AS DOUBLE) * ss / n)), 6) AS corr_vs
FROM mom WHERE n > 1
""".strip(),
    doc="Variance + correlation per user from raw integer moments "
    "(n, sum, sum-of-squares, cross-sum) instead of the built-in "
    "corr()/var_samp(): the moments are exact BIGINTs, so the derived "
    "statistics are bit-identical across engines — built-in one-pass "
    "covariance accumulates in float and diverges by summation order. "
    "Map-side combine still applies (moments are algebraic aggregates).",
)
def q_agg_variance_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.expr("ts div 1000000000") % 86400).cast("long").alias("s"),
    )
    mom = cents.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
        F.sum("s").cast("long").alias("ss"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("sss"),
        F.sum(F.col("v") * F.col("s")).cast("long").alias("svs"),
    )
    var_ = (
        F.col("svv") - F.col("sv").cast("double") * F.col("sv") / F.col("n")
    ) / (F.col("n") - 1)
    cov_num = (
        F.col("svs") - F.col("sv").cast("double") * F.col("ss") / F.col("n")
    )
    den = F.sqrt(
        (F.col("svv") - F.col("sv").cast("double") * F.col("sv") / F.col("n"))
        * (F.col("sss") - F.col("ss").cast("double") * F.col("ss") / F.col("n"))
    )
    return (
        mom.where("n > 1")
        .select(
            "user_id",
            "n",
            F.round(var_, 4).alias("var_cents"),
            F.round(cov_num / den, 6).alias("corr_vs"),
        )
    )


@register(
    "project-unpivot-stats",
    """
SELECT doc_id, metric, CAST(val AS BIGINT) AS val
FROM (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(strlen(text) - strlen(replace(text, '.', '')) AS BIGINT)
           AS n_periods
  FROM documents
)
UNPIVOT (val FOR metric IN (n_chars, n_words, n_periods))
""".strip(),
    doc="Unpivot/melt: wide per-doc stats to long (doc_id, metric, value) "
    "triples — the shape feature stores and metric pipelines ingest. "
    "Spark's native unpivot (no UNION ALL self-scan: one pass, rows x3 "
    "generated in the projection) vs DuckDB's UNPIVOT.",
)
def q_project_unpivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    wide = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("."), F.lit("")))
        ).cast("long").alias("n_periods"),
    )
    return wide.unpivot(
        ids=["doc_id"],
        values=["n_chars", "n_words", "n_periods"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "scalar-null-suite",
    """
SELECT doc_id,
       coalesce(nullif(lang, 'zh'), 'redacted') AS lang_or_redacted,
       (lang IS NOT DISTINCT FROM 'en') AS null_safe_en,
       CASE WHEN lang IS NULL THEN -1 ELSE strlen(lang) END AS lang_len,
       ifnull(NULL, doc_id) AS id_fallback
FROM documents
""".strip(),
    doc="Null-semantics completeness: nullif/coalesce chains, null-safe "
    "equality (Spark <=> == DuckDB IS NOT DISTINCT FROM), sentinel "
    "defaulting — the three-valued-logic corners every SQL surface must "
    "get right. Pure projection, codegen, no shuffle.",
)
def q_scalar_null_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.coalesce(F.nullif("lang", F.lit("zh")), F.lit("redacted")).alias(
            "lang_or_redacted"
        ),
        F.col("lang").eqNullSafe("en").alias("null_safe_en"),
        F.when(F.col("lang").isNull(), -1)
        .otherwise(F.length("lang"))
        .cast("long")
        .alias("lang_len"),
        F.ifnull(F.lit(None).cast("long"), F.col("doc_id")).alias(
            "id_fallback"
        ),
    )


@register(
    "agg-filtered-aggregates",
    """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
         AS n_clicks,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS n_errors,
       CAST(sum(CAST(round(value * 100) AS BIGINT))
            FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS purchase_cents,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events
GROUP BY user_id
""".strip(),
    doc="FILTER-clause aggregates: per-user metrics over different row "
    "subsets in ONE hash-agg pass — no self-joins, no CASE pyramids; "
    "partial aggregation applies to every filtered column independently.",
)
def q_agg_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("long")
        .alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "error", 1)).cast("long")
        .alias("n_errors"),
        F.sum(F.when(F.col("event_type") == "purchase", cents)).cast("long")
        .alias("purchase_cents"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


@register(
    "scalar-datetrunc-suite",
    """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS order_week,
       CAST(last_day(o_orderdate) AS DATE) AS month_end,
       CAST(isodow(o_orderdate) AS INTEGER) AS iso_weekday,
       CAST(date_diff('day', date_trunc('year', o_orderdate), o_orderdate)
            AS INTEGER) AS day_of_year0
FROM orders WHERE o_orderkey < 3000
""".strip(),
    doc="Datetime-truncation parity corners: month/week truncation (both "
    "engines start weeks on Monday), last_day, ISO weekday (Spark "
    "weekday()+1 == DuckDB isodow), day-of-year as an explicit "
    "date_diff from the year start (the built-in dayofyear is 1-based "
    "in both, but the diff formulation pins the semantics). Pure "
    "projection with a pushed-down key filter.",
)
def q_scalar_datetrunc_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where("o_orderkey < 3000")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("order_month"),
        F.date_trunc("week", d).cast("date").alias("order_week"),
        F.last_day(d).cast("date").alias("month_end"),
        (F.weekday(d) + 1).cast("int").alias("iso_weekday"),
        F.datediff(d.cast("date"), F.date_trunc("year", d).cast("date"))
        .cast("int")
        .alias("day_of_year0"),
    )


# --- TPC-H depth, wave 4: Q4/Q6/Q10/Q16 shapes ----------------------------------


@register(
    "agg-priority-exists-count",
    """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
""".strip(),
    doc="TPC-H-Q4 shape: EXISTS decorrelates to a left-semi join from "
    "orders to lineitem (Catalyst rewrites it; no per-row subquery "
    "execution), then a 5-group count. The date filter pushes to the "
    "orders scan before the join.",
)
def q_agg_priority_exists_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("order_count")
    )


@register(
    "agg-forecast-revenue",
    """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""".strip(),
    doc="TPC-H-Q6 shape (forecast revenue change): pure filter+sum with "
    "every predicate pushed to the parquet scan (date range, discount "
    "band, quantity cap all appear in PushedFilters) — the canonical "
    "pushdown showcase; the aggregate is a single partial-combined "
    "scalar.",
)
def q_agg_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "topk-returned-customers",
    """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".strip(),
    doc="TPC-H-Q10 shape (top customers by returned revenue): the "
    "returnflag filter pushes to the lineitem scan; customer/nation "
    "broadcast; the LIMIT becomes TakeOrderedAndProject (per-partition "
    "top-20 then a 20-row driver merge — never a global sort). "
    "Deterministic tiebreak on c_custkey.",
)
def q_topk_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "agg-part-supplier-variety",
    """
SELECT p.p_brand, p.p_type,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type NOT LIKE 'PROMO%'
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type
""".strip(),
    doc="TPC-H-Q16 shape (supplier variety per part family; lineitem "
    "stands in for partsupp): NOT IN over a subquery becomes a "
    "null-aware anti join against the tiny supplier side (broadcast), "
    "negated LIKE/equality prune part before ITS broadcast, and the "
    "distinct-count shuffles once on the group key.",
)
def q_agg_part_supplier_variety(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("PROMO%")
    )
    bad = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "window-rolling-range-frame",
    """
WITH daily AS (
  SELECT CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
)
SELECT day, cents,
       CAST(sum(cents) OVER (
         ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS rolling_7d_cents,
       CAST(count(*) OVER (
         ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS days_present
FROM daily
""".strip(),
    doc="RANGE-frame rolling window (vs the ROWS frames elsewhere): a "
    "7-day revenue sum keyed on the VALUE of the day column, so gaps in "
    "the calendar shrink the frame instead of silently spanning them — "
    "the semantics difference that makes time-series ROWS frames wrong. "
    "Integer cents keep parity exact. The daily rollup shrinks input "
    "to O(days) rows before the single-partition-safe ordered window.",
)
def q_window_rolling_range_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("ts div 1000000000 div 86400").cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).cast("long").alias("rolling_7d_cents"),
        F.count("*").over(w).cast("long").alias("days_present"),
    )


# --- TPC-H depth, wave 5: Q3/Q5/Q18 shapes --------------------------------------


@register(
    "topk-unshipped-orders",
    """
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       CAST(o.o_orderdate AS DATE) AS order_date, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_nationkey % 5 = 0
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""".strip(),
    doc="TPC-H-Q3 shape (unshipped orders: ordered before / shipped "
    "after the cutoff, customer segment filter): both date predicates "
    "push to their scans, customer broadcasts, and the top-10 is "
    "TakeOrderedAndProject with an l_orderkey tiebreak.",
)
def q_topk_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where("c_nationkey % 5 = 0")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "agg-local-supplier-volume",
    """
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
GROUP BY n.n_name
""".strip(),
    doc="TPC-H-Q5 shape (local supplier volume): the distinctive "
    "c_nationkey = s_nationkey SECOND join condition restricts to "
    "orders served by a supplier in the customer's own nation — a "
    "compound-key equi-join Catalyst folds into the supplier broadcast, "
    "not a filter afterward.",
)
def q_agg_local_supplier_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "join-large-volume-customers",
    """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate
""".strip(),
    doc="TPC-H-Q18 shape (large-volume customers): IN over a HAVING "
    "aggregate decorrelates to a semi join against the per-order "
    "quantity rollup — the rollup reuses lineitem's orderkey "
    "partitioning for both the HAVING agg and the semi join, so the "
    "subquery costs one extra agg, not an extra shuffle chain.",
)
def q_join_large_volume_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .where(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        li.join(big, li.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
    )


_LATERAL_TOPN_SQL = """
SELECT n.n_name AS nation, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
""".strip()


@register(
    "sql-lateral-topn",
    _LATERAL_TOPN_SQL,
    doc="Correlated LATERAL subquery (top-2 customers per nation), the "
    "same dialect-common string through spark.sql and DuckDB. Catalyst "
    "decorrelates the lateral into a ranked window join rather than "
    "executing the inner query per outer row — assert-worthy because "
    "naive nested-loop lateral evaluation would be O(nations x "
    "customers).",
)
def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPN_SQL)


@register(
    "setop-except-all",
    """
SELECT user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'view'
  EXCEPT ALL
  SELECT user_id FROM events WHERE event_type = 'error'
)
ORDER BY user_id
""".strip(),
    doc="EXCEPT ALL (bag difference — each error occurrence cancels ONE "
    "view occurrence per user, unlike EXCEPT's set semantics): Spark "
    "plans it as a counted hash aggregation, one shuffle, no join.",
)
def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    views = ev.where("event_type = 'view'").select("user_id")
    errors = ev.where("event_type = 'error'").select("user_id")
    return views.exceptAll(errors).orderBy("user_id")


@register(
    "scalar-bitwise-suite",
    """
SELECT event_id,
       CAST(event_id & 255 AS BIGINT) AS low_byte,
       CAST(event_id | 4096 AS BIGINT) AS with_flag,
       CAST(xor(event_id, 21845) AS BIGINT) AS toggled,
       CAST(event_id << 2 AS BIGINT) AS shl2,
       CAST(event_id >> 3 AS BIGINT) AS shr3,
       CAST(bit_count(event_id) AS INTEGER) AS popcount
FROM events WHERE event_id < 5000
""".strip(),
    doc="Bit-manipulation completeness (flag packing, the idiom behind "
    "bitmap presence/permission columns): and/or/xor/shifts/popcount as "
    "JVM intrinsics in codegen — never a UDF.",
)
def q_scalar_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where("event_id < 5000")
    e = F.col("event_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(255).cast("long").alias("low_byte"),
        e.bitwiseOR(4096).cast("long").alias("with_flag"),
        e.bitwiseXOR(21845).cast("long").alias("toggled"),
        F.shiftleft(e, 2).cast("long").alias("shl2"),
        F.shiftright(e, 3).cast("long").alias("shr3"),
        F.bit_count(e).cast("int").alias("popcount"),
    )


@register(
    "agg-presence-bitmap",
    """
WITH days AS (
  SELECT user_id,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day
  FROM events
),
cohort AS (SELECT user_id, min(day) AS day0 FROM days GROUP BY user_id)
SELECT d.user_id,
       CAST(bit_or(1 << CAST(d.day - c.day0 AS INTEGER)) AS BIGINT)
         AS presence_mask,
       CAST(bit_count(bit_or(1 << CAST(d.day - c.day0 AS INTEGER)))
            AS INTEGER) AS active_days
FROM days d JOIN cohort c ON d.user_id = c.user_id
WHERE d.day - c.day0 < 63
GROUP BY d.user_id
""".strip(),
    doc="Presence bitmap: each user's active days since first-seen packed "
    "into one BIGINT via bit_or(1 << offset) — the compact retention "
    "encoding that turns cohort math into popcounts and ANDs (62-day "
    "horizon fits a signed 64-bit mask). One agg for the cohort start, "
    "one for the mask, both on user_id: a single partitioning serves "
    "both.",
)
def q_agg_presence_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("ts div 1000000000 div 86400").alias("day")
    )
    cohort = days.groupBy("user_id").agg(F.min("day").alias("day0"))
    mask = F.expr(
        "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(day - day0 AS INT)))"
    )
    return (
        days.join(cohort, "user_id")
        .where(F.col("day") - F.col("day0") < 63)
        .groupBy("user_id")
        .agg(
            mask.cast("long").alias("presence_mask"),
            F.bit_count(mask).cast("int").alias("active_days"),
        )
    )


@register(
    "agg-event-transitions",
    """
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
           AS next_type
  FROM events
)
SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
FROM ordered WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""".strip(),
    doc="Event-transition matrix (Markov sequence mining): per-user "
    "lead() over a unique (ts, event_id) ordering, then count each "
    "(current, next) pair — funnel/journey analytics as one window pass "
    "+ one 25-cell agg. The window and any downstream per-user op share "
    "the user_id partitioning.",
)
def q_agg_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        ordered.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
    )


@register(
    "agg-timeseries-gapfill",
    """
WITH bounds AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
         CAST(max(o_orderdate) AS DATE) AS d1
  FROM orders
),
spine AS (
  SELECT r_name,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM region, bounds
),
actual AS (
  SELECT r.r_name, CAST(o.o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, CAST(o.o_orderdate AS DATE)
)
SELECT s.r_name, s.day,
       CAST(coalesce(last_value(a.revenue IGNORE NULLS) OVER (
              PARTITION BY s.r_name ORDER BY s.day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue_filled,
       a.revenue IS NULL AS is_gap
FROM spine s
LEFT JOIN actual a ON s.r_name = a.r_name AND s.day = a.day
""".strip(),
    doc="Time-series gap-fill: dense per-region daily revenue — calendar "
    "spine (sequence+explode / generate_series) LEFT-joined to actuals, "
    "missing days filled by LOCF (last_value IGNORE NULLS over an "
    "explicit ROWS frame; leading gap -> 0). Revenue stays DECIMAL end "
    "to end, so the fill is exact on both engines. Scale: the fact-side "
    "3-join broadcasts the dims and aggregates before the spine join, so "
    "the window runs over region x day cells (tiny vs the fact table); "
    "the spine itself is data-independent and broadcastable.",
)
def q_agg_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # one orders scan, not two (r11): the calendar bounds used to be a
    # separate min/max pass over orders; the 3 dim joins are
    # key-preserving (every order has exactly one customer -> nation ->
    # region), so min/max(day) over the checkpointed region x day
    # aggregate equals min/max(o_orderdate) over orders. A/B at sf0.1
    # (clean window, min-of-5): 1.104 -> 1.011 min, 1.199 -> 1.142 med,
    # result-identical.
    # REFERENTIAL-INTEGRITY ASSUMPTION (r11 ADVICE #2): this equivalence
    # holds only while every o_custkey resolves through customer ->
    # nation -> region (true for the TPC-H-style synthesized data, and
    # what the oracle parity proves). A data source with dangling
    # o_custkey rows would silently SHRINK the spine's date range versus
    # the documented SQL (the old shape would instead just leave a gap
    # row) — re-derive bounds from a direct orders scan if RI is ever
    # not guaranteed.
    actual = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("a_rname"),
            F.col("o_orderdate").cast("date").alias("a_day"),
        )
        .agg(
            F.sum(_dec("o_totalprice"))
            .cast("decimal(18,2)")
            .alias("revenue")
        )
    )
    actual = eager_cut(actual)
    bounds = actual.agg(
        F.min("a_day").alias("d0"), F.max("a_day").alias("d1")
    )
    spine = (
        region.crossJoin(F.broadcast(bounds))
        .select(
            "r_name",
            F.explode(
                F.expr("sequence(d0, d1, interval 1 day)")
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy(F.col("r_name"))
        .orderBy(F.col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(
        actual,
        (spine["r_name"] == actual["a_rname"])
        & (spine["day"] == actual["a_day"]),
        "left",
    )
    return joined.select(
        "r_name",
        "day",
        F.coalesce(
            F.last(F.col("revenue"), ignorenulls=True).over(w),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("decimal(18,2)")
        .alias("revenue_filled"),
        F.col("revenue").isNull().alias("is_gap"),
    )


@register(
    "agg-mad-outliers",
    """
WITH x AS (
  SELECT l_returnflag AS grp, CAST(l_extendedprice AS DECIMAL(12,2)) AS v
  FROM lineitem
),
hist AS (
  SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY grp, v
),
tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS cnt FROM hist GROUP BY grp),
cum AS (
  SELECT grp, v, c,
         CAST(sum(c) OVER (PARTITION BY grp ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cm
  FROM hist
),
med AS (
  SELECT h.grp,
         CAST(sum(CASE WHEN h.cm - h.c < (t.cnt + 1) // 2
                        AND (t.cnt + 1) // 2 <= h.cm
                       THEN h.v ELSE CAST(0 AS DECIMAL(12,2)) END)
            + sum(CASE WHEN h.cm - h.c < (t.cnt + 2) // 2
                        AND (t.cnt + 2) // 2 <= h.cm
                       THEN h.v ELSE CAST(0 AS DECIMAL(12,2)) END)
            AS DECIMAL(14,2)) AS med2
  FROM cum h JOIN tot t ON h.grp = t.grp GROUP BY h.grp
),
dev AS (
  SELECT h.grp, CAST(abs(2 * h.v - m.med2) AS DECIMAL(15,2)) AS d2, h.c
  FROM hist h JOIN med m ON h.grp = m.grp
),
dhist AS (
  SELECT grp, d2, CAST(sum(c) AS BIGINT) AS c FROM dev GROUP BY grp, d2
),
dcum AS (
  SELECT grp, d2, c,
         CAST(sum(c) OVER (PARTITION BY grp ORDER BY d2
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cm
  FROM dhist
),
mad AS (
  SELECT h.grp,
         CAST(sum(CASE WHEN h.cm - h.c < (t.cnt + 1) // 2
                        AND (t.cnt + 1) // 2 <= h.cm
                       THEN h.d2 ELSE CAST(0 AS DECIMAL(15,2)) END)
            + sum(CASE WHEN h.cm - h.c < (t.cnt + 2) // 2
                        AND (t.cnt + 2) // 2 <= h.cm
                       THEN h.d2 ELSE CAST(0 AS DECIMAL(15,2)) END)
            AS DECIMAL(17,2)) AS mad4
  FROM dcum h JOIN tot t ON h.grp = t.grp GROUP BY h.grp
)
SELECT d.grp AS l_returnflag,
       CAST(max(t.cnt) AS BIGINT) AS n,
       CAST(m.med2 * 0.5 AS DECIMAL(18,3)) AS median_price,
       CAST(a.mad4 * 0.25 AS DECIMAL(18,4)) AS mad,
       CAST(sum(CASE WHEN 2 * d.d2 > 3 * a.mad4 THEN d.c ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d
JOIN med m ON d.grp = m.grp
JOIN mad a ON d.grp = a.grp
JOIN tot t ON d.grp = t.grp
GROUP BY d.grp, m.med2, a.mad4
""".strip(),
    doc="Robust outlier census per return flag: median + MAD (median "
    "absolute deviation), flag |v - median| > 3*MAD. Exact-parity trick: "
    "medians are stated manually (sum of the two bracketing ranks) and "
    "the whole computation runs in doubled/quadrupled DECIMAL space "
    "(med2 = 2*median, mad4 = 4*MAD, test 2*d2 > 3*mad4), so no "
    "division ever happens and both engines agree bit-for-bit — "
    "built-in median/quantile_cont interpolate differently across "
    "engines. Scale (VERDICT r2 #3): the exact grouped median is "
    "computed from a VALUE HISTOGRAM, not a row-level ranking window — "
    "prices are DECIMAL(12,2), a bounded domain, so groupBy(grp, v) "
    "hash-aggregates (map-side partial combine) the corpus down to "
    "O(distinct values) rows, and the ordered cumulative-count window "
    "runs over the histogram only. The bracketing ranks are then picked "
    "from cumulative counts (rank r lives in the histogram row where "
    "cum - c < r <= cum). No full-corpus WindowExec exists in this plan "
    "at any scale; a window sort partitioned by the 3-value return flag "
    "would put ~1/3 of the corpus in ONE task's sort, and AQE cannot "
    "split window-sort stragglers (skew-split applies to shuffle joins). "
    "approx-percentile/t-digest (agg-approx-percentile-gate) remains the "
    "sketch path; this exact form now scales with the value domain.",
)
def q_agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # The whole chain runs in BIGINT CENTS (round 7): the decimal(12,2)
    # price is exact at 2 decimals, so *100 → long loses nothing, and
    # every downstream stage (hash-agg keys, window sort comparisons,
    # the checkpoint's row bytes) works on codegen-friendly longs
    # instead of 128-bit decimals — measured ~7% off the warm wall with
    # bit-identical output (the display columns convert back to DECIMAL
    # at the very end, exactly: /200 and /400 over integer cents are
    # 3- and 4-decimal-representable).
    x = li.select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    hist = x.groupBy("grp", "v").agg(F.count("*").cast("long").alias("c"))
    wv = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Per-group total fused INTO the window stage: cnt = max cumulative
    # count over an unordered grp window, which runs on the same sorted
    # partition as the cumulative sum — this deletes the separate `tot`
    # aggregate chain and its two broadcast re-joins (r5 profiling pass:
    # 23 -> 16 exchanges, 3.36 -> 2.96 s isolated at sf0.1, ~2.0x the
    # DuckDB twin; rows verified identical).
    wall = Window.partitionBy("grp")
    # localCheckpoint AFTER the cumulative windows (round-6 verdict #2,
    # reversing the r5 "not checkpointed" decision with new measurement):
    # cum is consumed by THREE downstream chains (med, dev, and the final
    # census); the initial plan scans lineitem 4x and rebuilds the
    # histogram 4x with no ReusedExchange (the median broadcast is built
    # once WITH cnt and once without, breaking canonical-plan equality).
    # A/B warm curves (5 runs each, docs/PERF.md r7 section): checkpoint
    # ~3.3 s vs ~3.9-4.9 s without — materializing the histogram-sized
    # cum (O(distinct prices): replication-INVARIANT, flat wall at 300x)
    # nets ~0.6 s by deleting the replays. The remaining wall is measured
    # work on the 594k-row value domain (prices are ~99% unique at
    # sf0.1), attributed stage by stage in tools/bench_mad_cut.py; a
    # same-box DuckDB runs the identical CTE chain in-process in ~1.3 s,
    # so the local ratio floor is ~2.5x — but the Spark wall is
    # DOMAIN-bound, not corpus-bound (300x data, 1.06x wall). The d2
    # window chain downstream still runs over a hash aggregate (dhist),
    # so the windows-run-over-histograms plan audit still sees the
    # histogram discipline (tests/test_plans.py).
    cum = eager_cut(
        hist.select(
            "grp", "v", "c", F.sum("c").over(wv).cast("long").alias("cm")
        )
        .withColumn("cnt", F.max("cm").over(wall))
    )
    lo = F.expr("(cnt + 1) div 2")
    hi = F.expr("(cnt + 2) div 2")

    def bracket(val_col: str, zero, out_type: str):
        """sum of the values holding the two bracketing ranks: rank r is
        in the histogram row where cm - c < r <= cm (at most one row per
        rank, so each sum has exactly one non-zero term)."""
        in_lo = (F.col("cm") - F.col("c") < lo) & (lo <= F.col("cm"))
        in_hi = (F.col("cm") - F.col("c") < hi) & (hi <= F.col("cm"))
        return (
            F.sum(F.when(in_lo, F.col(val_col)).otherwise(zero))
            + F.sum(F.when(in_hi, F.col(val_col)).otherwise(zero))
        ).cast(out_type)

    zero = F.lit(0)
    med = cum.groupBy("grp").agg(
        bracket("v", zero, "long").alias("med2"),
        F.max("cnt").cast("long").alias("cnt"),
    )
    dev = cum.join(F.broadcast(med.drop("cnt")), "grp").select(
        "grp",
        F.abs(F.lit(2) * F.col("v") - F.col("med2"))
        .cast("long")
        .alias("d2"),
        "c",
    )
    dhist = dev.groupBy("grp", "d2").agg(F.sum("c").cast("long").alias("c"))
    wd = (
        Window.partitionBy("grp")
        .orderBy("d2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dcum = dhist.select(
        "grp", "d2", "c", F.sum("c").over(wd).cast("long").alias("cm")
    ).withColumn("cnt", F.max("cm").over(wall))
    mad = dcum.groupBy("grp").agg(bracket("d2", zero, "long").alias("mad4"))
    return (
        dev.join(F.broadcast(mad), "grp")
        .join(F.broadcast(med), "grp")
        .groupBy("grp", "med2", "mad4", "cnt")
        .agg(
            F.sum(
                F.when(
                    F.lit(2) * F.col("d2") > F.lit(3) * F.col("mad4"),
                    F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            F.col("grp").alias("l_returnflag"),
            F.col("cnt").cast("long").alias("n"),
            # med2 is 2x the median in CENTS: /200 has exactly 3 decimals
            # (one cent over 2), so scale-6 decimal division is exact
            F.expr(
                "CAST(CAST(med2 AS DECIMAL(20,0)) * 5 / 1000"
                " AS DECIMAL(18,3))"
            ).alias("median_price"),
            # mad4 is 4x the MAD in cents: /400 has exactly 4 decimals
            F.expr(
                "CAST(CAST(mad4 AS DECIMAL(20,0)) * 25 / 10000"
                " AS DECIMAL(18,4))"
            ).alias("mad"),
            "n_outliers",
        )
    )


@register(
    "window-cumulative-distinct",
    """
WITH firsts AS (
  SELECT user_id, event_id, epoch_ns(ts) AS tns, event_type,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_ns(ts) ASC, event_id ASC) AS occ
  FROM events
)
SELECT user_id, event_id,
       CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) OVER (
              PARTITION BY user_id ORDER BY tns ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS INTEGER) AS distinct_types_so_far
FROM firsts
""".strip(),
    doc="Running count-distinct per user: COUNT(DISTINCT) over a running "
    "frame is unsupported in both engines' window functions, so it "
    "decomposes into a first-occurrence flag (row_number==1 per "
    "(user,type)) plus a running sum of flags — the standard rewrite "
    "that turns an O(frame) distinct into two linear window passes. "
    "Scale: both windows are user-bounded; the (user,type) pass "
    "sub-partitions the (user) pass, so skew is capped by the busiest "
    "user's row share either way.",
)
def q_window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    firsts = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.row_number().over(w1).alias("occ"),
    )
    return firsts.select(
        "user_id",
        "event_id",
        F.sum(F.when(F.col("occ") == 1, 1).otherwise(0))
        .over(w2)
        .cast("int")
        .alias("distinct_types_so_far"),
    )


@register(
    "agg-cooccurrence-lift",
    """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
supp AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM ut GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_both,
       CAST(p.n_both AS DOUBLE) * (SELECT n_users FROM n)
         / (sa.n_t * sb.n_t) AS lift
FROM pairs p
JOIN supp sa ON p.type_a = sa.event_type
JOIN supp sb ON p.type_b = sb.event_type
""".strip(),
    doc="Event-type co-occurrence lift (market-basket association over "
    "user baskets): P(a,b)/(P(a)P(b)) per unordered type pair. The "
    "distinct (user,type) projection collapses event volume to at most "
    "users x types rows BEFORE the self-join, so the pair join is "
    "bounded by types^2 per user, never events^2; supports are "
    "broadcast back onto the 10-row pair frame. All counts integer, "
    "one final IEEE division (exact cross-engine).",
)
def q_agg_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(
        F.count_distinct("user_id").cast("long").alias("n_users")
    )
    supp = ut.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_t")
    )
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    sa = supp.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    sb = supp.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


@register(
    "join-absent-followup",
    """
WITH c AS (
  SELECT user_id, CAST(min(epoch_ns(ts) // 1000000000) AS BIGINT) AS t_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT c.user_id, c.t_click
FROM c
WHERE NOT EXISTS (
  SELECT 1 FROM events e
  WHERE e.user_id = c.user_id AND e.event_type = 'purchase'
    AND epoch_ns(e.ts) // 1000000000 > c.t_click
    AND epoch_ns(e.ts) // 1000000000 <= c.t_click + 3600
)
""".strip(),
    doc="Absent-followup mining (the funnel complement): users whose "
    "first click is not followed by a purchase within one hour — NOT "
    "EXISTS with a band correlate, which Spark plans as a left-anti join with a "
    "range residual on the equi-shuffled user_id. The purchase side is "
    "filtered to one event type BEFORE the shuffle (predicate pushed to "
    "the scan), so the anti-join probes a small fraction of events.",
)
def q_join_absent_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.min(F.expr("ts div 1000000000")).cast("long").alias("t_click")
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.expr("ts div 1000000000").alias("p_sec"),
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_sec") > F.col("t_click"))
        & (F.col("p_sec") <= F.col("t_click") + 3600),
        "left_anti",
    )


@register(
    "window-activity-streaks",
    """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day
  FROM events
),
islands AS (
  SELECT user_id, day,
         day - row_number() OVER (
           PARTITION BY user_id ORDER BY day ASC) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS streak_len,
         CAST(min(day) AS BIGINT) AS start_day
  FROM islands GROUP BY user_id, island
),
best AS (
  SELECT user_id, streak_len, start_day,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY streak_len DESC, start_day ASC) AS rnk
  FROM streaks
)
SELECT user_id, streak_len AS longest_streak_days, start_day
FROM best WHERE rnk = 1
""".strip(),
    doc="Longest consecutive-day activity streak per user — the classic "
    "gaps-and-islands rewrite: day minus per-user row_number is constant "
    "within a consecutive run, so islands fall out of one window pass + "
    "one groupBy (no self-join, no recursion). Tiebreak on earliest "
    "start. Scale: everything is user_id-partitioned; the distinct "
    "day projection collapses event volume to user x active-day rows "
    "before any window sees it.",
)
def q_window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("ts div 1000000000 div 86400").alias("day")
    ).distinct()
    wi = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        "day",
        (F.col("day") - F.row_number().over(wi)).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("streak_len"),
        F.min("day").cast("long").alias("start_day"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("start_day").asc()
    )
    return (
        streaks.select(
            "user_id",
            "streak_len",
            "start_day",
            F.row_number().over(wb).alias("rnk"),
        )
        .where(F.col("rnk") == 1)
        .select(
            "user_id",
            F.col("streak_len").alias("longest_streak_days"),
            "start_day",
        )
    )


@register(
    "agg-gini-revenue",
    """
WITH cust AS (
  SELECT n.n_regionkey AS rk, o.o_custkey,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_regionkey, o.o_custkey
),
ranked AS (
  SELECT rk, rev,
         row_number() OVER (
           PARTITION BY rk ORDER BY rev ASC, o_custkey ASC) AS i
  FROM cust
),
sums AS (
  SELECT rk, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(i * rev) AS DECIMAL(28,2)) AS s1,
         CAST(sum(rev) AS DECIMAL(28,2)) AS s2
  FROM ranked GROUP BY rk
)
SELECT r.r_name, n AS n_customers,
       CAST(2 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE))
         - CAST(n + 1 AS DOUBLE) / n AS gini
FROM sums JOIN region r ON sums.rk = r.r_regionkey
""".strip(),
    doc="Revenue concentration (Gini coefficient) per region over "
    "customer lifetime revenue: G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n "
    "on revenues ranked ascending. Numerators accumulate in "
    "DECIMAL(28,2) (exact under any shuffle order); the two final IEEE "
    "divisions and one subtraction are correctly rounded from identical "
    "inputs on both engines. Scale: per-customer rollup shuffles once "
    "on (region, customer); the rank window and the moment sums ride "
    "the region partitioning; ties broken by custkey so ranks are "
    "stable.",
)
def q_agg_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_regionkey").alias("rk"), "o_custkey")
        .agg(F.sum(_dec("o_totalprice")).cast("decimal(18,2)").alias("rev"))
    )
    wr = Window.partitionBy("rk").orderBy(
        F.col("rev").asc(), F.col("o_custkey").asc()
    )
    ranked = cust.select(
        "rk", "rev", F.row_number().over(wr).alias("i")
    )
    sums = ranked.groupBy("rk").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("i") * F.col("rev")).cast("decimal(28,2)").alias("s1"),
        F.sum("rev").cast("decimal(28,2)").alias("s2"),
    )
    return sums.join(
        F.broadcast(region), sums["rk"] == region["r_regionkey"]
    ).select(
        "r_name",
        F.col("n").alias("n_customers"),
        (
            (F.lit(2) * F.col("s1")).cast("double")
            / (F.col("n").cast("double") * F.col("s2").cast("double"))
            - (F.col("n") + 1).cast("double") / F.col("n")
        ).alias("gini"),
    )


@register(
    "agg-rfm-segments",
    """
WITH anchor AS (SELECT CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   (SELECT d1 FROM anchor)) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
         CASE WHEN recency_days <= 90 THEN 4 WHEN recency_days <= 365 THEN 3
              WHEN recency_days <= 730 THEN 2 ELSE 1 END AS r,
         CASE WHEN frequency >= 20 THEN 4 WHEN frequency >= 10 THEN 3
              WHEN frequency >= 5 THEN 2 ELSE 1 END AS f,
         CASE WHEN monetary >= 1500000 THEN 4 WHEN monetary >= 750000 THEN 3
              WHEN monetary >= 250000 THEN 2 ELSE 1 END AS m
  FROM rfm
)
SELECT CASE
         WHEN r >= 3 AND f >= 3 AND m >= 3 THEN 'champion'
         WHEN r >= 3 AND f >= 2 THEN 'loyal'
         WHEN r <= 2 AND f >= 3 THEN 'at_risk'
         WHEN r <= 2 AND f <= 2 AND m >= 3 THEN 'big_spender_lapsed'
         ELSE 'hibernating' END AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(r * 100 + f * 10 + m) AS INTEGER) AS min_rfm_code,
       CAST(max(r * 100 + f * 10 + m) AS INTEGER) AS max_rfm_code
FROM scored GROUP BY 1
""".strip(),
    doc="RFM customer segmentation: per-customer recency (days since "
    "last order, anchored at the dataset max date), frequency, monetary "
    "rollup; banded 1-4 by fixed business thresholds (threshold bands "
    "instead of global ntile quartiles — no single-partition window, "
    "embarrassingly parallel, and the scores are stable as data grows); "
    "customers collapse into named lifecycle segments. One shuffle on "
    "custkey, then a 5-row segment agg. The anchor date is a 1-row "
    "scalar broadcast.",
)
def q_agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("d1")
    )
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(_dec("o_totalprice"))
            .cast("decimal(18,2)")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("d1"), F.col("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    r = (
        F.when(F.col("recency_days") <= 90, 4)
        .when(F.col("recency_days") <= 365, 3)
        .when(F.col("recency_days") <= 730, 2)
        .otherwise(1)
    )
    f_ = (
        F.when(F.col("frequency") >= 20, 4)
        .when(F.col("frequency") >= 10, 3)
        .when(F.col("frequency") >= 5, 2)
        .otherwise(1)
    )
    m = (
        F.when(F.col("monetary") >= 1500000, 4)
        .when(F.col("monetary") >= 750000, 3)
        .when(F.col("monetary") >= 250000, 2)
        .otherwise(1)
    )
    scored = rfm.select(
        r.alias("r"), f_.alias("f"), m.alias("m")
    )
    seg = (
        F.when(
            (F.col("r") >= 3) & (F.col("f") >= 3) & (F.col("m") >= 3),
            "champion",
        )
        .when((F.col("r") >= 3) & (F.col("f") >= 2), "loyal")
        .when((F.col("r") <= 2) & (F.col("f") >= 3), "at_risk")
        .when(
            (F.col("r") <= 2) & (F.col("f") <= 2) & (F.col("m") >= 3),
            "big_spender_lapsed",
        )
        .otherwise("hibernating")
    )
    code = F.col("r") * 100 + F.col("f") * 10 + F.col("m")
    return (
        scored.groupBy(seg.alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.min(code).cast("int").alias("min_rfm_code"),
            F.max(code).cast("int").alias("max_rfm_code"),
        )
    )


@register(
    "agg-dau-wau-stickiness",
    """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day
  FROM events
),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
),
spread AS (
  SELECT user_id, day + unnest(generate_series(0, 6)) AS wday FROM ud
),
wau AS (
  SELECT wday AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM spread GROUP BY wday
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud)
SELECT d.day, d.dau, w.wau,
       CAST(d.dau AS DOUBLE) / w.wau AS stickiness
FROM dau d JOIN wau w ON d.day = w.day, bounds
WHERE d.day >= bounds.d0 + 6 AND d.day <= bounds.d1
""".strip(),
    doc="DAU / trailing-7-day WAU / stickiness (DAU/WAU) per day — the "
    "engagement dashboard triple. Sliding distinct users can't ride a "
    "window frame (COUNT DISTINCT over RANGE is unsupported), so each "
    "active (user, day) is exploded into the 7 trailing days it "
    "contributes to, then one count-distinct per day — volume is "
    "active-pairs x 7, bounded by the distinct projection made FIRST. "
    "Warm-up days (no full trailing week) are trimmed. One IEEE "
    "division for stickiness.",
)
def q_agg_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # eager cut: the distinct (user, day) frame feeds THREE consumers
    # (dau, the 7-day spread -> wau, and the calendar bounds) — uncut,
    # each replays the events scan + distinct exchange. The checkpointed
    # frame is active-pairs-sized (users x days, far below event volume
    # at any scale). r11 A/B at sf0.1: 0.795 -> 0.693 s min,
    # 1.022 -> 0.835 med (min-of-5, same rows).
    ud = eager_cut(
        ev.select(
            "user_id", F.expr("ts div 1000000000 div 86400").alias("day")
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    spread = ud.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
    ).select("user_id", (F.col("day") + F.col("off")).alias("wday"))
    wau = spread.groupBy(F.col("wday").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )
    bounds = ud.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    return (
        dau.join(wau, "day")
        .crossJoin(F.broadcast(bounds))
        .where(
            (F.col("day") >= F.col("d0") + 6) & (F.col("day") <= F.col("d1"))
        )
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "agg-conversion-latency",
    """
WITH c AS (
  SELECT user_id, CAST(min(epoch_ns(ts) // 1000000000) AS BIGINT) AS t_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
conv AS (
  SELECT c.user_id, c.t_click,
         CAST(min(epoch_ns(e.ts) // 1000000000) AS BIGINT) AS t_purchase
  FROM c JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND epoch_ns(e.ts) // 1000000000 > c.t_click
  GROUP BY c.user_id, c.t_click
),
delays AS (
  SELECT CAST((t_click // 86400 + 3) % 7 AS INTEGER) AS click_dow,
         t_purchase - t_click AS delay_s
  FROM conv
),
ranked AS (
  SELECT click_dow, delay_s,
         row_number() OVER (
           PARTITION BY click_dow ORDER BY delay_s ASC) AS rn,
         count(*) OVER (PARTITION BY click_dow) AS cnt
  FROM delays
)
SELECT click_dow, CAST(max(cnt) AS BIGINT) AS n_conversions,
       CAST(max(CASE WHEN rn = (cnt + 1) // 2 THEN delay_s END) AS BIGINT)
         AS median_delay_s,
       CAST(max(CASE WHEN rn = (9 * cnt + 9) // 10 THEN delay_s END) AS BIGINT)
         AS p90_delay_s
FROM ranked GROUP BY click_dow
""".strip(),
    doc="Conversion latency: first click -> first subsequent purchase "
    "delay per user, with discrete (lower-)median and p90 by click "
    "weekday. Percentiles are picked at explicit ranks (row_number "
    "against the partition count) — percentile_disc/cont interpolate "
    "differently across engines, rank selection cannot. Weekday from "
    "pure integer epoch math (no timezone functions). Scale: per-user "
    "firsts shuffle once on user_id; the rank window partitions on the "
    "7 weekday groups of the already-tiny conversion frame.",
)
def q_agg_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.min(F.expr("ts div 1000000000")).cast("long").alias("t_click")
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.expr("ts div 1000000000").alias("p_sec"),
    )
    conv = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_sec") > F.col("t_click")),
        )
        .groupBy("user_id", "t_click")
        .agg(F.min("p_sec").cast("long").alias("t_purchase"))
    )
    delays = conv.select(
        (
            ((F.expr("t_click div 86400") + 3) % 7)
            .cast("int")
            .alias("click_dow")
        ),
        (F.col("t_purchase") - F.col("t_click")).alias("delay_s"),
    )
    wr = Window.partitionBy("click_dow").orderBy("delay_s")
    wp = Window.partitionBy("click_dow")
    ranked = delays.select(
        "click_dow",
        "delay_s",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wp).alias("cnt"),
    )
    return ranked.groupBy("click_dow").agg(
        F.max("cnt").cast("long").alias("n_conversions"),
        F.max(
            F.when(F.col("rn") == F.expr("(cnt + 1) div 2"), F.col("delay_s"))
        )
        .cast("long")
        .alias("median_delay_s"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * cnt + 9) div 10"),
                F.col("delay_s"),
            )
        )
        .cast("long")
        .alias("p90_delay_s"),
    )


# --- TPC-H wave 6: the three partsupp shapes (Q2/Q11/Q20) -----------------------
# The fixture set ships no partsupp table, so both engines synthesize the
# SAME one deterministically: 4 supplier slots per part, keys/qty/cost from
# pure integer arithmetic (cost in CENTS — no floats anywhere). With this,
# all 22 TPC-H query shapes have explicit twins.

PARTSUPP_SQL = """
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey * 13 + i * 7 + 1) % (SELECT count(*) FROM supplier)
           AS BIGINT) AS ps_suppkey,
         CAST((p_partkey * 7 + i * 13) % 9999 + 1 AS BIGINT) AS ps_availqty,
         CAST((p_partkey * 31 + i * 17) % 100000 + 100 AS BIGINT) AS ps_cost_c
  FROM part, unnest(generate_series(0, 3)) AS t(i)
)
""".strip()


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of PARTSUPP_SQL (cost in cents, all integer-exact)."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    n_supp = _t(spark, sf_dir, "supplier").agg(
        F.count("*").alias("n_supp")
    )
    return (
        part.crossJoin(F.broadcast(n_supp))
        .select(
            "p_partkey",
            "n_supp",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 13 + F.col("i") * 7 + 1) % F.col("n_supp"))
            .cast("long")
            .alias("ps_suppkey"),
            ((F.col("p_partkey") * 7 + F.col("i") * 13) % 9999 + 1)
            .cast("long")
            .alias("ps_availqty"),
            ((F.col("p_partkey") * 31 + F.col("i") * 17) % 100000 + 100)
            .cast("long")
            .alias("ps_cost_c"),
        )
    )


@register(
    "join-min-cost-supplier",
    f"""
WITH {PARTSUPP_SQL},
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
ns AS (SELECT count(*) AS n_supp FROM supplier),
cand AS (
  SELECT ps_partkey, ps_suppkey, ps_cost_c, s_name, s_acctbal, n_name,
         ps_cost_c * n_supp + ps_suppkey AS k
  FROM partsupp JOIN eu_supp ON ps_suppkey = s_suppkey CROSS JOIN ns
),
best AS (
  SELECT ps_partkey, min(k) AS bk
  FROM cand GROUP BY ps_partkey
)
SELECT c.ps_partkey AS p_partkey, c.s_name,
       CAST(c.s_acctbal AS DECIMAL(18,2)) AS s_acctbal, c.n_name,
       CAST(c.ps_cost_c AS BIGINT) AS cost_c
FROM cand c
JOIN best b ON c.ps_partkey = b.ps_partkey AND c.k = b.bk
JOIN part p ON c.ps_partkey = p.p_partkey
WHERE p.p_size % 5 = 0 AND p.p_type = 'ECONOMY'
""".strip(),
    doc="TPC-H Q2 shape: cheapest EUROPE supplier per qualifying part — "
    "min-cost-per-group with the supplier key folded into the ordering "
    "key so ties resolve identically in both engines (argmin on ties is "
    "otherwise engine-defined). The fold width is the supplier COUNT "
    "(ps_suppkey < n_supp by construction), so the key stays injective "
    "at every SF — a fixed 10000 would silently mis-tiebreak past SF 1 "
    "(ADVICE r1). Scale: the region-filtered supplier dim is broadcast; "
    "the per-part argmin is ONE map-side-combining hash agg "
    "(min over struct(k, payload) — injective k makes it exactly the "
    "old min-then-join-back row, r11); the part filter commutes with "
    "the per-part min, so Spark applies it BEFORE the agg.",
)
def q_join_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    good_parts = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_size") % 5 == 0) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    n_supp = _t(spark, sf_dir, "supplier").agg(F.count("*").alias("n_supp"))
    # argmin as ONE aggregate (r11): k is injective per part (ps_suppkey
    # < n_supp by construction), so min(struct(k, payload)) IS the row
    # the old min-k-then-join-back selected — and the lazy `cand` subtree
    # (partsupp synth x part filter x broadcast eu) no longer runs twice
    # (once under `best`, once under the join). A/B at sf0.1:
    # 2.63 -> 2.27 s min, 3.03 -> 2.51 med, same 390 rows.
    cand = (
        ps.join(
            good_parts, ps["ps_partkey"] == good_parts["p_partkey"]
        )  # filter first: commutes with the per-part min
        .join(F.broadcast(eu), ps["ps_suppkey"] == eu["s_suppkey"])
        .crossJoin(F.broadcast(n_supp))  # 1-row scalar: the fold width
        .select(
            "ps_partkey",
            F.struct(
                (F.col("ps_cost_c") * F.col("n_supp") + F.col("ps_suppkey"))
                .alias("k"),
                "s_name",
                "s_acctbal",
                "n_name",
                "ps_cost_c",
            ).alias("sc"),
        )
    )
    best = cand.groupBy("ps_partkey").agg(F.min("sc").alias("m"))
    return best.select(
        F.col("ps_partkey").alias("p_partkey"),
        F.col("m.s_name").alias("s_name"),
        F.col("m.s_acctbal").cast("decimal(18,2)").alias("s_acctbal"),
        F.col("m.n_name").alias("n_name"),
        F.col("m.ps_cost_c").cast("long").alias("cost_c"),
    )


@register(
    "agg-important-stock",
    f"""
WITH {PARTSUPP_SQL},
asia AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 2
),
vals AS (
  SELECT ps_partkey, CAST(sum(ps_cost_c * ps_availqty) AS BIGINT) AS value_c
  FROM partsupp JOIN asia ON ps_suppkey = s_suppkey
  GROUP BY ps_partkey
),
tot AS (
  SELECT sum(CAST(value_c AS DECIMAL(38,0))) AS total_c,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM vals
)
SELECT ps_partkey, value_c
FROM vals, tot
WHERE CAST(value_c AS DOUBLE) * CAST(n_parts AS DOUBLE)
      > 2.0 * CAST(total_c AS DOUBLE)
""".strip(),
    doc="TPC-H Q11 shape: inventory value per part held by ASIA-region "
    "suppliers, keeping parts worth more than 2x the mean part value. "
    "The global-fraction threshold is definitionally a global scalar "
    "(1-row broadcast). The r9 overflow audit rewrote the comparison: "
    "the old pure-BIGINT cross-multiplication value_c * n_parts wraps "
    "at ~2.3e7 parts (~sf115, value_c~4e11), so the threshold test is "
    "now a DOUBLE expression shared verbatim by both engines over "
    "identical exact integers — bit-identical floats, engines agree at "
    "every boundary — and the global total accumulates in DECIMAL(38,0) "
    "(a BIGINT total wraps ~sf2e4). Per-part value_c stays BIGINT: "
    "bounded by suppliers-per-part x 1e11, not corpus size. Scale: one "
    "hash agg on ps_partkey, one 1-row rollup of its output.",
)
def q_agg_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    asia = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    vals = (
        ps.join(F.broadcast(asia), ps["ps_suppkey"] == asia["s_suppkey"])
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_cost_c") * F.col("ps_availqty"))
            .cast("long")
            .alias("value_c")
        )
    )
    tot = vals.agg(
        F.sum(F.col("value_c").cast("decimal(38,0)")).alias("total_c"),
        F.count("*").cast("long").alias("n_parts"),
    )
    return (
        vals.crossJoin(F.broadcast(tot))
        .where(
            F.col("value_c").cast("double") * F.col("n_parts").cast("double")
            > 2.0 * F.col("total_c").cast("double")
        )
        .select("ps_partkey", "value_c")
    )


@register(
    "join-excess-stock-supplier",
    f"""
WITH {PARTSUPP_SQL},
ship AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'small%'
  LEFT JOIN ship ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE 2 * ps_availqty > coalesce(qty, 0)
)
SELECT s_suppkey, s_name
FROM supplier JOIN excess ON s_suppkey = ps_suppkey
WHERE s_nationkey % 5 = 0
""".strip(),
    doc="TPC-H Q20 shape: suppliers of 'small%' parts whose available "
    "stock exceeds half the quantity they shipped in 1996 — the "
    "correlated-threshold semi-join chain. 2*avail > qty keeps the "
    "half-threshold in integers (l_quantity is integral in the "
    "fixture). Scale: the date-bounded shipment rollup shuffles on "
    "(partkey, suppkey) once; the part filter prunes partsupp before "
    "the join; DISTINCT collapses to the supplier key set before the "
    "final dim join.",
)
def q_join_excess_stock_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    small = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    ship = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    excess = (
        ps.join(F.broadcast(small), ps["ps_partkey"] == small["p_partkey"])
        .join(
            ship,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
            "left",
        )
        .where(2 * F.col("ps_availqty") > F.coalesce(F.col("qty"), F.lit(0)))
        .select("ps_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier").where(F.col("s_nationkey") % 5 == 0)
    return supp.join(
        F.broadcast(excess), supp["s_suppkey"] == excess["ps_suppkey"]
    ).select("s_suppkey", "s_name")


@register(
    "agg-touch-attribution",
    """
WITH p AS (
  SELECT event_id AS pid, user_id, epoch_ns(ts) AS pt
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id AS tid, user_id, epoch_ns(ts) AS tt, event_type
  FROM events WHERE event_type IN ('view', 'click', 'signup')
),
cand AS (
  SELECT p.pid, t.event_type,
         ((p.pt - t.tt) // 1000000) * 1000000000 + t.tid AS k
  FROM p JOIN t
    ON p.user_id = t.user_id
   AND t.tt < p.pt AND t.tt >= p.pt - 86400000000000
),
fl AS (
  SELECT pid, max_by(event_type, k) AS first_t, min_by(event_type, k) AS last_t
  FROM cand GROUP BY pid
)
SELECT model, touch_type, CAST(count(*) AS BIGINT) AS n_purchases
FROM (
  SELECT 'first' AS model, first_t AS touch_type FROM fl
  UNION ALL
  SELECT 'last', last_t FROM fl
)
GROUP BY model, touch_type
""".strip(),
    doc="Multi-touch attribution: every purchase credits the FIRST and "
    "the LAST view/click/signup touch in its trailing 24 h, counted per "
    "(model, touch type). The arg-extremum is max_by/min_by over a "
    "composite integer key — age truncated to MILLISECONDS scaled by "
    "1e9 plus the event id (injective for id spaces to 1e9; same-ms "
    "ties resolve to the higher id, identically in both engines — a "
    "struct-comparison argmax would not be engine-portable). Scale: the "
    "touch join is banded by user AND the 24 h window, so candidate "
    "fan-out is per-user session volume, not |touches| x |purchases|; "
    "one shuffle on user_id, then ONE hash agg on the purchase id — the "
    "round-3 100x sweep caught the previous form re-evaluating the "
    "candidate join three times through argmax join-backs.",
)
def q_agg_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pt"),
    )
    t = ev.where(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tt"),
        F.col("event_type").alias("touch_type"),
    )
    cand = p.join(
        t,
        (F.col("pu") == F.col("tu"))
        & (F.col("tt") < F.col("pt"))
        & (F.col("tt") >= F.col("pt") - 86400000000000),
    ).select(
        "pid",
        "touch_type",
        # clamp BEFORE scaling: Catalyst may evaluate this projection in a
        # stage where not-yet-filtered pairs exist, and a multi-year age
        # scaled up overflows int64 under ANSI mode; in-band rows are
        # unaffected by the clamp. Age truncates to ms so the 1e9 fold
        # width (event-id space) keeps the product inside int64.
        (
            F.expr(
                "greatest(least(pt - tt, 86400000000000), 0) div 1000000"
            )
            * 1000000000
            + F.col("tid")
        ).alias("k"),
    )
    fl = cand.groupBy("pid").agg(
        F.expr("max_by(touch_type, k)").alias("first_t"),
        F.expr("min_by(touch_type, k)").alias("last_t"),
    )
    first = fl.select(
        F.lit("first").alias("model"), F.col("first_t").alias("touch_type")
    )
    last = fl.select(
        F.lit("last").alias("model"), F.col("last_t").alias("touch_type")
    )
    return (
        first.unionByName(last)
        .groupBy("model", "touch_type")
        .agg(F.count("*").cast("long").alias("n_purchases"))
    )


@register(
    "agg-anomaly-rolling-z",
    """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, day
),
win AS (
  SELECT event_type, day, c,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(c) OVER w AS BIGINT) AS s,
         CAST(sum(c * c) OVER w AS BIGINT) AS ss
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, c,
       CAST(c * n - s AS BIGINT) AS dev_n,
       n >= 7 AND (c * n - s) > 0
         AND (c * n - s) * (c * n - s) > 4 * (n * ss - s * s) AS spike
FROM win
""".strip(),
    doc="Rolling anomaly detection: per event type, flag days whose count "
    "sits more than 2 sigma above the trailing-7-day mean. The z>2 test "
    "is cross-multiplied into pure integers — (c*n-s)^2 > 4*(n*ss-s^2) "
    "is z^2>4 with every denominator cleared — so no sqrt, no float, no "
    "engine divergence; warm-up days (frame < 7 rows) never flag. "
    "Scale: the heavy input collapses to O(types x days) in one "
    "map-side-combining agg BEFORE the window; the frame then runs over "
    "calendar-bounded rows, partitioned by event type.",
)
def q_agg_anomaly_rolling_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("ts div 1000000000 div 86400").cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    win = daily.select(
        "event_type",
        "day",
        "c",
        F.count("*").over(w).cast("long").alias("n"),
        F.sum("c").over(w).cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("long").alias("ss"),
    )
    dev = F.col("c") * F.col("n") - F.col("s")
    return win.select(
        "event_type",
        "day",
        "c",
        dev.cast("long").alias("dev_n"),
        (
            (F.col("n") >= 7)
            & (dev > 0)
            & (dev * dev > 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s")))
        ).alias("spike"),
    )


@register(
    "agg-basket-pairs",
    """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
counts AS (
  SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
  FROM pairs GROUP BY part_a, part_b
)
SELECT part_a, part_b, n_orders
FROM counts
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
""".strip(),
    doc="Market-basket pair mining: the 20 part pairs most often bought "
    "in the same order — collect each order's distinct parts into a "
    "sorted basket array, then expand the i<j pairs in-row, so each "
    "unordered pair appears once and the (count desc, part_a, part_b) "
    "total order makes the LIMIT cut deterministic. Scale: ONE shuffle "
    "on the order key (collect_set dedups in the same hash-agg) replaces "
    "the distinct+self-join plan's extra sort-merge join; fan-out stays "
    "bounded at basket-size-squared over unique parts (TPC-H baskets "
    "are ~4-7 items). At pathological basket sizes, cap the array with "
    "slice() or prune to frequent items first (apriori) before pairing.",
)
def q_agg_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    baskets = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    # In-row i<j expansion of the sorted basket: for element i (0-based),
    # pair it with every later element via slice(parts, i+2, n) (1-based
    # start; slice clamps past the end, and an empty slice for the last
    # element contributes nothing).
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS part_a, y AS part_b)))"
                )
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@register(
    "scalar-variant-json",
    """
SELECT event_id,
       CAST(props->>'$.k' AS INTEGER) AS k,
       CAST(props->>'$.k' AS INTEGER) % 10 AS k_band,
       CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
FROM events
WHERE CAST(props->>'$.k' AS INTEGER) >= 50
""".strip(),
    doc="Spark-4 VARIANT path for semi-structured columns: parse_json "
    "once into a variant, then typed variant_get extraction — the "
    "shredded-JSON fast path that replaces per-access string re-parsing "
    "(get_json_object re-tokenizes the whole blob on every call; a "
    "variant parses once and navigates a binary encoding). Oracle is "
    "DuckDB's JSON operators on the same column. Scale: narrow map, "
    "whole-stage codegen, no shuffle; at 100 TB store hot JSON columns "
    "as variant-shredded parquet so extraction never touches the raw "
    "text at all.",
)
def q_scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "props")
    # try_parse_json, not parse_json: a malformed props row must degrade to
    # NULL like the oracle's json_valid path, never throw (ADVICE r1).
    # is_valid = parse SUCCEEDED (variant non-null) — is_variant_null would
    # test for the JSON `null` literal, a different predicate.
    v = ev.select(
        "event_id", F.expr("try_parse_json(props)").alias("pv")
    )
    out = v.select(
        "event_id",
        F.expr("variant_get(pv, '$.k', 'int')").alias("k"),
        (F.expr("variant_get(pv, '$.k', 'int')") % 10).alias("k_band"),
        F.expr(
            "CASE WHEN pv IS NULL THEN 0 ELSE 1 END"
        ).cast("int").alias("is_valid"),
    )
    return out.where(F.col("k") >= 50)


@register(
    "filter-malformed-json",
    """
WITH raw AS (
  SELECT event_id,
         CASE WHEN event_id % 11 = 0 THEN substring(props, 1, 4)
              WHEN event_id % 13 = 0 THEN ''
              ELSE props END AS props
  FROM events
),
parsed AS (
  SELECT event_id, props,
         CASE WHEN json_valid(props)
              THEN CAST(props->>'$.k' AS INTEGER) END AS k
  FROM raw
)
SELECT
  CASE WHEN k IS NOT NULL THEN 'ok'
       WHEN length(props) = 0 THEN 'empty'
       ELSE 'malformed' END AS status,
  CAST(count(*) AS BIGINT) AS n,
  CAST(coalesce(sum(k), 0) AS BIGINT) AS k_total
FROM parsed
GROUP BY status
""".strip(),
    doc="Error-as-data for semi-structured ingestion: a corpus with "
    "injected malformed/empty JSON is parsed with NULL-on-failure "
    "semantics (from_json, never an exception), every row routed to "
    "exactly one of ok/empty/malformed, and the good rows still "
    "aggregate — one bad record cannot kill the job, and the bad-record "
    "census is itself queryable (reference: extractor.md:747 'never "
    "silently fail'; DESIGN.md error codes E001-E008). Scale: narrow "
    "map + small hash agg; the parse failure path allocates nothing.",
)
def q_filter_malformed_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "props")
    raw = ev.select(
        "event_id",
        F.when(F.col("event_id") % 11 == 0, F.substring("props", 1, 4))
        .when(F.col("event_id") % 13 == 0, F.lit(""))
        .otherwise(F.col("props"))
        .alias("props"),
    )
    parsed = raw.select(
        "event_id",
        "props",
        F.from_json("props", "k int").getField("k").alias("k"),
    )
    status = (
        F.when(F.col("k").isNotNull(), "ok")
        .when(F.length("props") == 0, "empty")
        .otherwise("malformed")
    )
    return (
        parsed.groupBy(status.alias("status"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("k_total"),
        )
    )


@register(
    "join-null-safe-eq",
    """
WITH a AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE CAST(event_id % 5 AS BIGINT) END AS k
  FROM events WHERE event_id % 2 = 0
),
b AS (
  SELECT event_id,
         CASE WHEN event_id % 9 = 0 THEN NULL
              ELSE CAST(event_id % 5 AS BIGINT) END AS k
  FROM events WHERE event_id % 2 = 1 AND event_id < 2000
)
SELECT a.k AS k,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
""".strip(),
    doc="Null-safe equi-join: Spark's <=> (eqNullSafe) against DuckDB's "
    "IS NOT DISTINCT FROM — NULL keys MATCH each other instead of "
    "vanishing, the semantics deduplication-by-key pipelines need when "
    "'unknown' is itself a join class. Catalyst still plans this as a "
    "hash join (null-safe equality is a valid equi-key), not a nested "
    "loop — the null bucket simply hashes like any other value; one "
    "shuffle each side, broadcast here since b is filtered small.",
)
def q_join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id")
    a = ev.where(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("aid"),
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise((F.col("event_id") % 5).cast("long"))
        .alias("ak"),
    )
    b = ev.where(
        (F.col("event_id") % 2 == 1) & (F.col("event_id") < 2000)
    ).select(
        F.col("event_id").alias("bid"),
        F.when(F.col("event_id") % 9 == 0, None)
        .otherwise((F.col("event_id") % 5).cast("long"))
        .alias("bk"),
    )
    return (
        a.join(F.broadcast(b), a["ak"].eqNullSafe(b["bk"]))
        .groupBy(F.col("ak").alias("k"))
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


_RECURSIVE_CHAIN_SQL = """
WITH RECURSIVE reach(node, depth) AS (
  SELECT CAST(n_nationkey AS BIGINT) AS node, 0 AS depth
  FROM nation WHERE n_nationkey < 5
  UNION ALL
  SELECT CAST(n.n_nationkey AS BIGINT), r.depth + 1
  FROM reach r JOIN nation n ON n.n_nationkey = r.node + 5
)
SELECT node, CAST(min(depth) AS INTEGER) AS depth,
       CAST(count(*) AS BIGINT) AS n_paths
FROM reach GROUP BY node
""".strip()


@register(
    "sql-recursive-closure",
    _RECURSIVE_CHAIN_SQL,
    doc="Spark 4 native recursive CTE: reachability over the nation-key "
    "chain (n -> n+5, depth up to 4) with the SAME dialect-common "
    "WITH RECURSIVE string running through spark.sql AND through DuckDB "
    "as its own oracle. This is the declarative twin of the engine's "
    "driver-loop iteration (operators/clustering.py connected "
    "components, streaming/frontier.py BFS): bounded-diameter closures "
    "can now stay entirely inside one Catalyst plan — no driver loop, "
    "no lineage management. Deep/unbounded graphs still belong to the "
    "checkpointed loop, which controls per-round materialization.",
)
def q_sql_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_CHAIN_SQL)


_LISTAGG_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sources,
       listagg(source, ',') WITHIN GROUP (ORDER BY source) AS sources
FROM (SELECT DISTINCT lang, source FROM documents)
GROUP BY lang
""".strip()


@register(
    "agg-listagg-sources",
    """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sources,
       string_agg(source, ',' ORDER BY source) AS sources
FROM (SELECT DISTINCT lang, source FROM documents)
GROUP BY lang
""".strip(),
    doc="Native listagg WITHIN GROUP (Spark 4) — ordered string "
    "aggregation as one aggregate function instead of the "
    "concat_ws(collect_list(...)) idiom; oracle is DuckDB's equivalent "
    "string_agg(... ORDER BY ...). The DISTINCT projection first bounds "
    "each group's concat at the source-cardinality, not row count; the "
    "WITHIN GROUP ordering makes the output byte-deterministic under "
    "any partitioning.",
)
def q_agg_listagg_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LISTAGG_SQL)


@register(
    "join-scd2-pointintime",
    """
WITH hist AS (
  SELECT o_custkey AS custkey, o_orderpriority AS segment,
         o_orderdate AS valid_from,
         lead(o_orderdate, 1, TIMESTAMP '2999-01-01') OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM orders
),
facts AS (
  SELECT o.o_custkey AS custkey, l.l_shipdate AS ship,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT h.segment,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(f.price_c) AS BIGINT) AS revenue_c
FROM facts f JOIN hist h
  ON f.custkey = h.custkey
 AND f.ship >= h.valid_from AND f.ship < h.valid_to
GROUP BY h.segment
""".strip(),
    doc="SCD2 point-in-time lookup: a type-2 validity-interval dimension "
    "(customer segment history derived from order priorities, half-open "
    "[valid_from, valid_to) intervals built with one lead window and a "
    "deterministic (date, orderkey) tiebreak — equal-date versions "
    "collapse to zero-width intervals that match nothing in BOTH "
    "engines) joined to ship-date facts by interval containment. "
    "Revenue in integer cents. Scale: the join is equi on custkey with "
    "the range predicates post-filtering per-customer version lists — "
    "fan-out is versions-per-customer, not |facts| x |dim|. Round-11 "
    "three-shape A/B at sf0.1 AND on the 10x-distinct corpus: this "
    "shape WINS — the union-and-LOCF as-of form (operators/asof.py) "
    "lost 2x at 10x (the full-union per-customer sort costs more than "
    "the bounded fan-out), and a collect_list+sorted-array per-row "
    "lookup lost 2x at sf0.1 (higher-order array lambdas run "
    "interpreted). The residual >1 ratio vs DuckDB "
    "(docs/scale_crossover.json) is its specialized IEJoin interval "
    "operator, an engine primitive Spark lacks — not a plan defect.",
)
def q_join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("segment"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead(
            "o_orderdate", 1, "2999-01-01"
        ).over(w).alias("valid_to"),
    )
    li = _t(spark, sf_dir, "lineitem")
    facts = li.join(
        o.select("o_orderkey", "o_custkey"),
        li["l_orderkey"] == o["o_orderkey"],
    ).select(
        F.col("o_custkey").alias("fcust"),
        F.col("l_shipdate").alias("ship"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
    )
    return (
        facts.join(
            hist,
            (F.col("fcust") == hist["custkey"])
            & (F.col("ship") >= hist["valid_from"])
            & (F.col("ship") < hist["valid_to"]),
        )
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("price_c").cast("long").alias("revenue_c"),
        )
    )


@register(
    "agg-decayed-popularity",
    """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, day
),
bounds AS (SELECT max(day) AS d1 FROM daily)
SELECT event_type,
       CAST(sum(c * (CAST(1 AS BIGINT) << CAST(30 - (d1 - day) AS INTEGER)))
         AS BIGINT) AS decayed_score,
       CAST(sum(c) AS BIGINT) AS raw_count
FROM daily, bounds
WHERE d1 - day <= 30
GROUP BY event_type
""".strip(),
    doc="Exponentially time-decayed popularity (half-life one day over "
    "the trailing month): weight = 2^(30-age) as an integer BIT SHIFT, "
    "so the decay sum is exact in both engines — the float pow() form "
    "would accumulate in engine-specific order. The trending-score shape "
    "every feed/ranker pipeline runs. Scale: raw events collapse to "
    "O(types x days) map-side first; the global anchor day is a 1-row "
    "broadcast; weights stay under 2^31 so sums fit comfortably in "
    "int64 at any event volume under ~2^32 rows/day/type.",
)
def q_agg_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("ts div 1000000000 div 86400").cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("c"))
    )
    bounds = daily.agg(F.max("day").alias("d1"))
    return (
        daily.crossJoin(F.broadcast(bounds))
        .where(F.col("d1") - F.col("day") <= 30)
        .select(
            "event_type",
            "c",
            F.expr(
                "c * shiftleft(cast(1 as bigint),"
                " cast(30 - (d1 - day) as int))"
            ).alias("w"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("w").cast("long").alias("decayed_score"),
            F.sum("c").cast("long").alias("raw_count"),
        )
    )


@register(
    "join-salted-hot-key",
    """
WITH fact AS (
  SELECT CASE WHEN event_id % 10 < 9 THEN 0
              ELSE CAST(event_id % 97 AS BIGINT) END AS k,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
),
dim AS (
  SELECT CAST(i AS BIGINT) AS k, CAST(i * 3 + 1 AS BIGINT) AS w
  FROM (SELECT unnest(generate_series(0, 96)) AS i)
)
SELECT CASE WHEN f.k = 0 THEN 'hot' ELSE 'cold' END AS band,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(f.v_c * d.w) AS BIGINT) AS weighted_c
FROM fact f JOIN dim d ON f.k = d.k
GROUP BY band
""".strip(),
    doc="Skew-mitigated join as a first-class operator: a 90%-hot-key "
    "fact frame joins its dim through operators/partitioning.salted_join "
    "— the hot key spreads over 8 salt sub-keys, the dim replicates per "
    "salt — and the oracle is the PLAIN join, proving salting changes "
    "only shuffle layout, never results (salt values are random but "
    "result-irrelevant). Measured wall-clock impact of this strategy at "
    "90% skew is in docs/PERF.md (tools/bench_skew.py). Values in "
    "integer cents.",
)
def q_join_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import partitioning as P

    ev = _t(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("event_id") % 10 < 9, F.lit(0).cast("long"))
        .otherwise((F.col("event_id") % 97).cast("long"))
        .alias("k"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    dim = spark.range(0, 97).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3 + 1).cast("long").alias("w"),
    )
    joined = P.salted_join(fact, dim, "k", n_salts=8)
    return (
        joined.select(
            F.when(F.col("k") == 0, "hot").otherwise("cold").alias("band"),
            (F.col("v_c") * F.col("w")).alias("wv"),
        )
        .groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("wv").cast("long").alias("weighted_c"),
        )
    )


def _zexpr_sql(a: str, b: str, bits: int) -> str:
    """DuckDB twin of operators/partitioning.zorder_key: Morton interleave
    as pure shift/mask arithmetic (disjoint bit positions make + == |)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_Z_KEYED_SQL = f"""
  SELECT o_orderkey,
         CAST(o_custkey % 256 AS BIGINT) AS ca,
         CAST(floor(o_totalprice / 2000) AS BIGINT) % 256 AS cb
  FROM orders
""".strip()


@register(
    "sort-zorder-key",
    f"""
WITH keyed AS (
  {_Z_KEYED_SQL}
)
SELECT o_orderkey, ca, cb,
       CAST({_zexpr_sql('ca', 'cb', 8)} AS BIGINT) AS zkey
FROM keyed
ORDER BY zkey, o_orderkey
LIMIT 50
""".strip(),
    doc="Z-order (Morton) clustering key as a first-class query: orders "
    "bucketized to an 8-bit (custkey, price-band) grid, interleaved via "
    "operators/partitioning.zorder_key — the write-time sort key that "
    "clusters BOTH dimensions at once so parquet footer min/max stay "
    "narrow on either column (docs/SCALE.md 'Z-order layout'). Pure "
    "shiftleft/and arithmetic, whole-stage codegen, no shuffle beyond "
    "the top-50 TakeOrdered; the production write path is "
    "partitioning.write_zordered (repartitionByRange on the key). "
    "o_orderkey tiebreak makes the LIMIT deterministic.",
)
def q_sort_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators.partitioning import zorder_key

    keyed = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("ca"),
        (F.floor(F.col("o_totalprice") / 2000).cast("long") % 256).alias(
            "cb"
        ),
    )
    return (
        keyed.select(
            "o_orderkey",
            "ca",
            "cb",
            zorder_key("ca", "cb", 8).cast("long").alias("zkey"),
        )
        .orderBy("zkey", "o_orderkey")
        .limit(50)
    )


@register(
    "agg-zonemap-prune",
    f"""
WITH keyed AS (
  {_Z_KEYED_SQL}
),
z AS (
  SELECT ca, cb, {_zexpr_sql('ca', 'cb', 8)} AS zkey FROM keyed
),
files AS (
  SELECT 'linear' AS layout, ca >> 4 AS file_id,
         min(cb) AS min_b, max(cb) AS max_b
  FROM z GROUP BY layout, file_id
  UNION ALL
  SELECT 'zorder' AS layout, zkey >> 12 AS file_id,
         min(cb) AS min_b, max(cb) AS max_b
  FROM z GROUP BY layout, file_id
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS files_total,
       CAST(sum(CASE WHEN max_b >= 32 AND min_b <= 47 THEN 1 ELSE 0 END)
            AS BIGINT) AS files_hit
FROM files
GROUP BY layout
""".strip(),
    doc="Zone-map (parquet footer min/max) pruning simulation — the "
    "data-skipping payoff of the z-order layout, measured as a query: "
    "assign each row to one of 16 'files' under (a) a linear layout "
    "(top 4 bits of the custkey bucket — every file spans the full "
    "price range) and (b) the z-order layout (top 4 bits of the Morton "
    "key — each file is a compact rectangle), then count files whose "
    "[min,max] price band intersects a selective predicate on the "
    "SECOND dimension. Linear hits every file; z-order prunes ~3/4 of "
    "them — the reason write_zordered exists. File assignment is pure "
    "bit arithmetic (no global window, no extra shuffle: one hash-agg "
    "per layout), so the simulation itself is scale-right.",
)
def q_agg_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators.partitioning import zorder_key

    keyed = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 256).cast("long").alias("ca"),
        (F.floor(F.col("o_totalprice") / 2000).cast("long") % 256).alias(
            "cb"
        ),
    )
    z = keyed.select(
        "ca", "cb", zorder_key("ca", "cb", 8).cast("long").alias("zkey")
    )
    linear = z.groupBy(
        F.lit("linear").alias("layout"),
        F.shiftright(F.col("ca"), 4).alias("file_id"),
    ).agg(F.min("cb").alias("min_b"), F.max("cb").alias("max_b"))
    zord = z.groupBy(
        F.lit("zorder").alias("layout"),
        F.shiftright(F.col("zkey"), 12).alias("file_id"),
    ).agg(F.min("cb").alias("min_b"), F.max("cb").alias("max_b"))
    files = linear.unionByName(zord)
    hit = (F.col("max_b") >= 32) & (F.col("min_b") <= 47)
    return files.groupBy("layout").agg(
        F.count("*").cast("long").alias("files_total"),
        F.sum(hit.cast("int")).cast("long").alias("files_hit"),
    )


@register(
    "agg-profile-columns",
    """
WITH s AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS nulls_rf,
    CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nd_rf,
    CAST(sum(length(l_returnflag)) AS BIGINT) AS len_rf,
    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS nulls_qty,
    CAST(count(DISTINCT l_quantity) AS BIGINT) AS nd_qty,
    CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
    CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS nulls_ship,
    CAST(count(DISTINCT l_shipdate) AS BIGINT) AS nd_ship
  FROM lineitem
)
SELECT col, n_rows, n_nulls, n_distinct, min_i, max_i, sum_len
FROM (
  SELECT 'l_returnflag' AS col, n_rows, nulls_rf AS n_nulls, nd_rf AS n_distinct,
         CAST(NULL AS BIGINT) AS min_i, CAST(NULL AS BIGINT) AS max_i,
         len_rf AS sum_len FROM s
  UNION ALL
  SELECT 'l_quantity', n_rows, nulls_qty, nd_qty, min_qty, max_qty,
         CAST(NULL AS BIGINT) FROM s
  UNION ALL
  SELECT 'l_shipdate', n_rows, nulls_ship, nd_ship, CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM s
)
""".strip(),
    doc="Table profiling (the data-catalog 'describe' op): per-column "
    "null counts, distinct cardinality, numeric min/max, and string "
    "length mass for a column set of lineitem, computed in ONE scan as "
    "a wide aggregate and unpivoted to long form — N columns never cost "
    "N scans. Type-specific stats are NULL-typed per column class. "
    "Scale: distinct counts are the expensive part (one hash per "
    "column); at 100 TB swap count(DISTINCT) for approx_count_distinct "
    "per column — agg-approx-distinct's accuracy gate covers that "
    "substitution.",
)
def q_agg_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("l_returnflag").isNull(), 1).otherwise(0))
        .cast("long").alias("nulls_rf"),
        F.count_distinct("l_returnflag").cast("long").alias("nd_rf"),
        F.sum(F.length("l_returnflag")).cast("long").alias("len_rf"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0))
        .cast("long").alias("nulls_qty"),
        F.count_distinct("l_quantity").cast("long").alias("nd_qty"),
        F.min(F.col("l_quantity").cast("long")).cast("long").alias("min_qty"),
        F.max(F.col("l_quantity").cast("long")).cast("long").alias("max_qty"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("long").alias("nulls_ship"),
        F.count_distinct("l_shipdate").cast("long").alias("nd_ship"),
    )
    null_l = F.lit(None).cast("long")
    rows = [
        s.select(
            F.lit("l_returnflag").alias("col"), "n_rows",
            F.col("nulls_rf").alias("n_nulls"),
            F.col("nd_rf").alias("n_distinct"),
            null_l.alias("min_i"), null_l.alias("max_i"),
            F.col("len_rf").alias("sum_len"),
        ),
        s.select(
            F.lit("l_quantity").alias("col"), "n_rows",
            F.col("nulls_qty").alias("n_nulls"),
            F.col("nd_qty").alias("n_distinct"),
            F.col("min_qty").alias("min_i"), F.col("max_qty").alias("max_i"),
            null_l.alias("sum_len"),
        ),
        s.select(
            F.lit("l_shipdate").alias("col"), "n_rows",
            F.col("nulls_ship").alias("n_nulls"),
            F.col("nd_ship").alias("n_distinct"),
            null_l.alias("min_i"), null_l.alias("max_i"),
            null_l.alias("sum_len"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "scalar-format-suite",
    """
SELECT doc_id,
       printf('doc-%06d/%s', doc_id, lang) AS doc_ref,
       translate(lang, 'aeiou', 'AEIOU') AS lang_t,
       rpad(lang, 6, '.') AS lang_pad,
       repeat(substring(lang, 1, 1), 4) AS lead4,
       reverse(source) AS src_rev
FROM documents
WHERE doc_id % 7 = 0
""".strip(),
    doc="String-formatting family: printf/format_string templating, "
    "translate character mapping, rpad, repeat, reverse — the rendering "
    "kernels the INDEX/REPORT sinks and slug/frontmatter projections "
    "compose (reference: crawler-summarizer.md:188-284 report assembly, "
    "extract-jina.sh:54 slug building). All JVM built-ins inside one "
    "whole-stage-codegen projection; byte-identical across engines.",
)
def q_scalar_format_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.format_string("doc-%06d/%s", F.col("doc_id"), F.col("lang"))
        .alias("doc_ref"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_t"),
        F.rpad("lang", 6, ".").alias("lang_pad"),
        F.repeat(F.substring("lang", 1, 1), 4).alias("lead4"),
        F.reverse("source").alias("src_rev"),
    )


@register(
    "topk-diversified-sources",
    """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY n_chars DESC, doc_id) AS in_src
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(in_src AS INTEGER) AS in_src
FROM ranked
WHERE in_src <= 3
ORDER BY n_chars DESC, doc_id
LIMIT 20
""".strip(),
    doc="Diversified top-k (the feed/search-results pattern): global "
    "top-20 longest docs but at most 3 per source, so one dominant "
    "source cannot monopolize the page. Per-group rank window first "
    "(state O(3) per source), then TakeOrderedAndProject over the "
    "survivors — no global sort; both orderings carry doc_id tiebreaks "
    "so the cut lines are deterministic in both engines.",
)
def q_topk_diversified_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).alias("in_src"),
    ).where(F.col("in_src") <= 3)
    return (
        ranked.select(
            "doc_id", "source", "n_chars",
            F.col("in_src").cast("int").alias("in_src"),
        )
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(20)
    )


@register(
    "window-first-nth-value",
    """
SELECT user_id, first_ev, second_ev, n_events
FROM (
  SELECT user_id,
         first_value(event_type) OVER w AS first_ev,
         nth_value(event_type, 2) OVER w AS second_ev,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
) WHERE rn = 1
""".strip(),
    doc="first_value / nth_value window functions (the positional family "
    "alongside the lag/lead and ranking suites): each user's first and "
    "second lifetime event types over a full-partition frame, one "
    "summary row per user selected by a reverse rank. (ts, event_id) "
    "ordering keys everywhere — no tie is left to engine choice. "
    "Scale: one shuffle on user_id serves all four window functions "
    "(same partitioning), frame is whole-partition so state is O(1) "
    "per function.",
)
def q_window_first_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wp = Window.partitionBy("user_id")
    out = ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_ev"),
        F.nth_value("event_type", 2).over(w).alias("second_ev"),
        F.count("*").over(wp).cast("long").alias("n_events"),
        F.row_number().over(wr).alias("rn"),
    )
    return out.where(F.col("rn") == 1).drop("rn")


@register(
    "window-share-of-total",
    """
WITH rev AS (
  SELECT n_name,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, rev_c,
       CAST(floor(CAST(rev_c AS DOUBLE) * 1000000.0
                  / CAST(sum(rev_c) OVER () AS DOUBLE)) AS BIGINT)
         AS share_ppm
FROM rev
""".strip(),
    doc="Ratio-to-report (percent-of-total window): each nation's revenue "
    "share of the global total in integer parts-per-million. The ppm is "
    "floor() of a DOUBLE ratio whose expression is shared VERBATIM by "
    "both engines over identical exact BIGINT inputs — bit-identical "
    "doubles, so the engines agree at every boundary. (The r9 overflow "
    "audit killed the old cross-multiplied BIGINT form: rev_c*1e6 wraps "
    "at rev_c>9.2e12, i.e. ~sf10, and DuckDB's DECIMAL // rounds instead "
    "of flooring, so no shared integer form survives at scale. The "
    "BIGINT rev_c sum itself is safe: 6e11 rows x 3.8e6 avg cents = "
    "2.3e18 < 2^63.) The unpartitioned window runs over the NATION "
    "rollup (25 rows, bounded by dim cardinality, never event volume); "
    "the heavy input is reduced by a map-side-combining hash agg first.",
)
def q_window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_c")
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        "rev_c",
        F.expr(
            "CAST(floor(CAST(rev_c AS DOUBLE) * 1000000.0"
            " / CAST(sum(rev_c) OVER () AS DOUBLE)) AS BIGINT)"
        ).alias("share_ppm"),
    )


@register(
    "join-full-outer-census",
    """
WITH big AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey HAVING count(*) >= 12
),
cust AS (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0
)
SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
              THEN 'matched'
            WHEN c_custkey IS NOT NULL THEN 'customer_only'
            ELSE 'orders_only' END AS side,
       CAST(count(*) AS BIGINT) AS n,
       CAST(coalesce(sum(n_orders), 0) AS BIGINT) AS orders_covered
FROM cust FULL OUTER JOIN big ON c_custkey = o_custkey
GROUP BY side
""".strip(),
    doc="Full-outer-join census: two deliberately partial key sets (every "
    "3rd customer vs heavy-orderer rollup) joined FULL OUTER and every "
    "row classified matched / customer_only / orders_only — the "
    "reconciliation shape behind CDC diffs (scan-cdc-diff) stated as its "
    "own operator, with null-side aggregation (coalesced order mass) "
    "proving outer nulls flow through aggregates identically in both "
    "engines. Scale: both sides pre-reduced before the wide join; the "
    "census output is 3 rows.",
)
def q_join_full_outer_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        o.groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .where(F.col("n_orders") >= 12)
    )
    cust = c.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", "c_mktsegment"
    )
    joined = cust.join(
        big, cust["c_custkey"] == big["o_custkey"], "full_outer"
    )
    side = (
        F.when(
            F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(),
            "matched",
        )
        .when(F.col("c_custkey").isNotNull(), "customer_only")
        .otherwise("orders_only")
    )
    return joined.groupBy(side.alias("side")).agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum("n_orders"), F.lit(0))
        .cast("long")
        .alias("orders_covered"),
    )


def _spatial_pts_sql() -> str:
    from ai_knowledge_etl_spark.operators.sketches import duck_md5_slice

    hx = duck_md5_slice("CAST(c_custkey AS VARCHAR)", 1, 4)
    hy = duck_md5_slice("CAST(c_custkey AS VARCHAR)", 5, 4)
    return f"""
  SELECT c_custkey AS id,
         CAST({hx} % 1000 AS BIGINT) AS x,
         CAST({hy} % 1000 AS BIGINT) AS y
  FROM customer
""".strip()


@register(
    "join-spatial-grid",
    f"""
WITH pts AS (
  {_spatial_pts_sql()}
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
FROM pts a JOIN pts b
  ON a.id < b.id
 AND b.x BETWEEN a.x - 10 AND a.x + 10
 AND b.y BETWEEN a.y - 10 AND a.y + 10
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 100
""".strip(),
    doc="Spatial distance join (all point pairs within Euclidean "
    "distance 10 on a deterministic md5-derived 1000x1000 integer "
    "grid) via GRID-CELL BLOCKING — the 2-D analog of the banded "
    "interval join: one side expands to its 3x3 neighbor cells "
    "(cell size = radius, so any qualifying pair shares an expanded "
    "cell exactly once), candidates meet in an EQUI-join on the cell "
    "key, and the exact integer distance predicate filters the joined "
    "rows. Never all-pairs: candidate count is bounded by points per "
    "cell squared times 9. The ORACLE is the independent formulation — "
    "a direct inequality join on coordinate bands plus the exact "
    "distance predicate, no grid, no hashing — so the differential "
    "proves the blocking loses no pair and invents none. Scale: the cell-key "
    "shuffle is uniform by construction (md5 coords); at real-world "
    "skew (cities), salt the hot cells exactly like hot join keys.",
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators.sketches import md5_slice

    ck = F.col("c_custkey").cast("string")
    pts = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        (md5_slice(ck, 1, 4) % 1000).alias("x"),
        (md5_slice(ck, 5, 4) % 1000).alias("y"),
    )
    cx = F.floor(F.col("x") / 10).cast("long")
    cy = F.floor(F.col("y") / 10).cast("long")
    off = F.explode(
        F.array(*[F.lit(i) for i in (-1, 0, 1)])
    )
    a = (
        pts.withColumn("dx", off)
        .withColumn(
            "dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
        )
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            ((cx + F.col("dx")) * 1000 + cy + F.col("dy")).alias("cell"),
        )
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        (cx * 1000 + cy).alias("cell"),
    )
    dist2 = (F.col("xa") - F.col("xb")) * (
        F.col("xa") - F.col("xb")
    ) + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, "cell")
        .where((F.col("id_a") < F.col("id_b")) & (dist2 <= 100))
        .select(
            "id_a", "id_b", dist2.cast("long").alias("dist2")
        )
    )


@register(
    "join-interval-overlap",
    """
WITH spans AS (
  SELECT event_id, user_id,
         epoch_ns(ts) // 1000000000 AS s0,
         epoch_ns(ts) // 1000000000 + (event_id % 7 + 1) * 30 AS s1
  FROM events WHERE event_type IN ('click', 'view')
),
incid AS (
  SELECT event_id AS iid, user_id,
         epoch_ns(ts) // 1000000000 AS i0,
         epoch_ns(ts) // 1000000000 + 120 AS i1
  FROM events WHERE event_type = 'error'
),
hits AS (
  SELECT s.event_id,
         count(*) AS n_overlaps,
         sum(least(s.s1, i.i1) - greatest(s.s0, i.i0)) AS overlap_s
  FROM spans s JOIN incid i
    ON s.user_id = i.user_id AND s.s0 < i.i1 AND i.i0 < s.s1
  GROUP BY s.event_id
)
SELECT s.event_id, s.user_id,
       CAST(coalesce(h.n_overlaps, 0) AS BIGINT) AS n_overlaps,
       CAST(coalesce(h.overlap_s, 0) AS BIGINT) AS overlap_s
FROM spans s LEFT JOIN hits h ON s.event_id = h.event_id
""".strip(),
    doc="Interval-overlap join with VARIABLE-length intervals (activity "
    "spans 30-210 s x 120 s incident windows, same user, overlap iff "
    "a.start < b.end AND b.start < a.end) — the general range join "
    "Catalyst has no physical strategy for; a naive user writes the "
    "inequality condition and gets a per-user nested-loop cross "
    "product. Spark plan: bin BOTH sides to fixed 256 s buckets (each "
    "interval explodes into the <=2 buckets it covers — bounded by "
    "max-interval-length/width, never data-dependent), equi-join on "
    "(user, bucket), residual overlap filter, and keep a pair only in "
    "the FIRST bucket the two intervals share "
    "(bucket = greatest(floor(s0/W), floor(i0/W))) so each overlapping "
    "pair matches exactly once with no distinct pass. At 100 TB the "
    "equi-join shuffles hash-partitioned on (user, bucket) and "
    "whole-stage-codegens; the complementary point-in-window form is "
    "join-range-window. Reference analog: the crawl scheduler's "
    "time-window conflict check (crawler-coordinator.md queue slots).",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sec = F.expr("ts div 1000000000")
    spans = ev.where(F.col("event_type").isin("click", "view")).select(
        "event_id",
        "user_id",
        sec.alias("s0"),
        (sec + (F.col("event_id") % 7 + 1) * 30).alias("s1"),
    )
    incid = ev.where(F.col("event_type") == "error").select(
        "user_id",
        sec.alias("i0"),
        (sec + 120).alias("i1"),
    )
    from ai_knowledge_etl_spark.operators.intervals import (
        interval_overlap_join,
    )

    hits = (
        interval_overlap_join(
            spans, incid, "user_id", ("s0", "s1"), ("i0", "i1"), width=256
        )
        .groupBy("event_id")
        .agg(
            F.count("*").alias("n_ov"),
            F.sum(
                F.least(F.col("s1"), F.col("i1"))
                - F.greatest(F.col("s0"), F.col("i0"))
            ).alias("ov_s"),
        )
    )
    return spans.join(hits, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("n_ov", F.lit(0)).cast("long").alias("n_overlaps"),
        F.coalesce("ov_s", F.lit(0)).cast("long").alias("overlap_s"),
    )


@register(
    "udf-arrow-batch-stats",
    """
SELECT CAST(l_returnflag AS VARCHAR) AS flag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_c
FROM lineitem GROUP BY 1
""".strip(),
    doc="mapInArrow API-coverage entry (the third Python execution "
    "surface after pandas_udf and mapInPandas): the kernel receives raw "
    "pyarrow RecordBatches — no pandas conversion, no index, the lowest "
    "constant-factor path for columnar Python — and emits per-batch "
    "partial (flag, n, qty_cents) triples via pure Arrow compute; the "
    "JVM hash-aggregates the partials. Integer cents make the partials "
    "associative, so the result is partitioning-invariant. The hot "
    "paths in this repo stay JVM-side; this entry pins the API contract "
    "(batch schema, zero-copy columns, multiple output batches).",
)
def q_udf_arrow_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            t = pa.table(
                {
                    "flag": batch.column(0),
                    "qty_c": pc.cast(
                        pc.round(pc.multiply(
                            pc.cast(batch.column(1), pa.float64()), 100.0
                        )),
                        pa.int64(),
                    ),
                }
            )
            g = t.group_by("flag").aggregate(
                [("qty_c", "count"), ("qty_c", "sum")]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    g.column("flag").combine_chunks(),
                    pc.cast(g.column("qty_c_count"), pa.int64()).combine_chunks(),
                    g.column("qty_c_sum").combine_chunks(),
                ],
                names=["flag", "n", "qty_c"],
            )

    partials = li.mapInArrow(gen, "flag string, n long, qty_c long")
    return partials.groupBy("flag").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("qty_c").cast("long").alias("qty_c"),
    )
