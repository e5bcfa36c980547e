"""Corpus-quality & retrieval wave: published training-data pipeline rules
re-expressed Spark-first, each with an exact DuckDB oracle.

- udf-unigram-logprob: CCNet-style LM quality score — the corpus's own
  unigram distribution scores every document (the production form swaps a
  pretrained table for the self-trained one; identical plan).
- filter-repetition-gopher: Gopher-style repetition gates (duplicate
  word-3-gram fraction + top-word occupancy).
- text-bm25-rank: BM25 retrieval over the document corpus for the topic
  terms — the reference's relevance scoring generalized to the standard
  ranked-retrieval formula (reference: skills/relevance-scorer/SKILL.md
  scores keyword hits; BM25 is the principled version of the same signal).
- stream-late-data-watermark: batch twin of watermark late-data accounting
  (arrival order = event_id, watermark = running max event time − delay);
  the running max is the scale-safe two-pass prefix scheme, the global
  ordered window stays oracle-side.
- graph-degree-distribution / graph-jaccard-neighbors: link-graph analytics
  over the crawl edge list (reference: crawler-coordinator.md:161-176 keeps
  links/*.json) — degree histogram and common-neighbor link prediction with
  hub-cap hygiene.

Parity conventions per registry/__init__ docstring: identical aliases,
integer-exact intermediates where possible, ln()/division chains rounded to
3-4 decimals on BOTH sides, deterministic tiebreaks on every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config
from ai_knowledge_etl_spark.operators import lm
from ai_knowledge_etl_spark.registry import register
from ai_knowledge_etl_spark.session import eager_cut
from ai_knowledge_etl_spark.sources import synthetic as syn
from ai_knowledge_etl_spark.sources.catalog import load_table

# DuckDB-side token explode (Spark side uses F.split/F.explode — each engine
# its own idiom, same tokens: the corpus is single-space separated).
TOKS_CTE = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
""".strip()


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )


@register(
    "udf-unigram-logprob",
    f"""
WITH {TOKS_CTE},
{lm.oracle_lm_ctes("toks")}
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(lp), 3) AS avg_logprob
FROM lmtoks
GROUP BY doc_id
""".strip(),
    doc="CCNet-style unigram-LM quality score under a CAPPED vocabulary "
    "(operators/lm.avg_logprob): every doc scored by the corpus's own "
    "unigram distribution, but the LM table broadcast to executors is "
    "top-K tokens + ONE OOV bucket carrying the residual mass — <= K+1 "
    "rows at ANY corpus size, like a shipped KenLM artifact. The "
    "uncapped form (broadcast the full raw vocab) OOMs at 100 TB: Heaps' "
    "law puts raw web vocab in the billions of types. Top-K selection is "
    "sort+limit = TakeOrderedAndProject (distributed top-K, no global "
    "sort); the cap BINDS on this corpus (K=24 < 31 types) so the OOV "
    "path is differentially tested. No Python in the loop.",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(_docs(spark, sf_dir))
    return lm.avg_logprob(toks)


@register(
    "filter-repetition-gopher",
    f"""
WITH probe AS (
  SELECT doc_id, {syn.REPEAT_TEXT_EXPR} AS text FROM documents
),
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM probe
          WHERE text IS NOT NULL),
tri AS (
  SELECT doc_id,
         greatest(len(ws) - 2, 1) AS t3,
         len(list_distinct(list_transform(
             generate_series(1, greatest(len(ws) - 2, 1)),
             i -> array_to_string(ws[i:i+2], ' ')))) AS d3
  FROM words
),
tw AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS w FROM words) GROUP BY doc_id, w
),
top AS (SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS n_tokens
        FROM tw GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(1.0 - CAST(d3 AS DOUBLE) / t3, 4) AS dup3_ratio,
       round(CAST(mx AS DOUBLE) / n_tokens, 4) AS top_word_ratio,
       (1.0 - CAST(d3 AS DOUBLE) / t3 <= {config.GOPHER_DUP3_MAX}
        AND CAST(mx AS DOUBLE) / n_tokens <= {config.GOPHER_TOPWORD_MAX})
       AS keep
FROM tri JOIN top USING (doc_id)
""".strip(),
    doc="Gopher-style repetition gates: duplicate word-3-gram fraction and "
    "top-word occupancy, thresholded (config.GOPHER_*). The corpus gets a "
    "spam probe (synthetic.REPEAT_TEXT_EXPR) so both reject classes have "
    "true positives. All intermediates are integer-exact (array counts); "
    "both per-doc metrics are PURE per-row array expressions from one "
    "tokenization pass (operators/curation.gopher_metrics: the top-word "
    "count is the max equal-run in the sorted array, so there is no "
    "token explode, no (doc, word) hash agg, and no join) — zero "
    "shuffles, embarrassingly parallel at any scale.",
)
def q_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import curation as CU

    probe = _docs(spark, sf_dir).select(
        "doc_id", F.expr(syn.REPEAT_TEXT_EXPR).alias("text")
    )
    # Drop NULL-text docs BEFORE the metric fold: the oracle's
    # tri JOIN top shape drops them implicitly (unnest(NULL ws) emits no
    # rows), so without this filter Spark would keep a NULL-metrics row
    # the oracle never produces (round-6 ADVICE #2).
    words = probe.where(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    m = CU.gopher_metrics(words)
    dup3 = 1.0 - F.col("d3").cast("double") / F.col("t3")
    topw = F.col("mx").cast("double") / F.col("n_tokens")
    return m.select(
        "doc_id",
        "n_tokens",
        F.round(dup3, 4).alias("dup3_ratio"),
        F.round(topw, 4).alias("top_word_ratio"),
        (
            (dup3 <= config.GOPHER_DUP3_MAX)
            & (topw <= config.GOPHER_TOPWORD_MAX)
        ).alias("keep"),
    )


BM25_TERMS = ("spark", "join", "window")


@register(
    "text-bm25-rank",
    f"""
WITH {TOKS_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM toks
  WHERE w IN {BM25_TERMS!r} GROUP BY doc_id, w
),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w)
SELECT doc_id,
       round(sum(
         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         * tf * ({config.BM25_K1} + 1.0)
         / (tf + {config.BM25_K1}
            * (1.0 - {config.BM25_B} + {config.BM25_B} * dl / avgdl))
       ), 4) AS bm25
FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id), stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT {config.BM25_TOPK}
""".strip(),
    doc="BM25 ranked retrieval for the topic terms (k1/b per config) — the "
    "standard-formula generalization of the reference's keyword relevance "
    "scores (skills/relevance-scorer/SKILL.md:69-86). Spark plan: tokens "
    "filtered to the query terms BEFORE any shuffle (predicate on the "
    "explode output), tf hash-agg, df + corpus stats as 1-row/broadcast "
    "joins, TakeOrderedAndProject for the top-k. The per-doc length table "
    "is the only corpus-wide agg.",
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(_docs(spark, sf_dir))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.where(F.col("w").isin(*BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    k1, b = config.BM25_K1, config.BM25_B
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score = idf * F.col("tf") * (k1 + 1.0) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(config.BM25_TOPK)
    )


@register(
    "stream-late-data-watermark",
    """
WITH arr AS (
  SELECT event_id, event_type, epoch_ns(ts) AS ts_ns,
         max(epoch_ns(ts)) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm_src
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN wm_src IS NOT NULL
                      AND ts_ns < wm_src - 600000000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM arr GROUP BY event_type
""".strip(),
    doc="Watermark late-data accounting, batch twin: arrival order is "
    "event_id, the watermark before each event is the running max event "
    "time minus a 10-minute delay, and an event is late if its timestamp "
    "falls behind that — exactly what `withWatermark('ts', '10 minutes')` "
    "drops in Structured Streaming. The running max uses the two-pass "
    "partition-prefix scheme (operators/ids.running_max_two_pass) — no "
    "single-reducer window; the ordered-window SQL stays oracle-side only.",
)
def q_late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators.ids import running_max_two_pass

    # repo convention: events.ts is a BIGINT ns epoch (catalog.load_table),
    # so the 10-minute delay is 600e9 ns on both sides
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    wm = running_max_two_pass(ev, ["event_id"], "ts", out_col="wm_src")
    late = F.col("wm_src").isNotNull() & (
        F.col("ts") < F.col("wm_src") - F.lit(600_000_000_000)
    )
    return wm.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).cast("bigint").alias("n_late"),
    )


# DuckDB-side undirected crawl-graph edges (self-loops removed); Spark twin
# in _edges below. Two edge families: the parent tree (the reference's
# links/*.json) plus a "related hub" edge (doc_id % 75) standing in for
# cross-links — without it every doc has exactly one neighbor and the
# common-neighbor query is vacuously empty.
EDGES_CTE = """
edges AS (
  SELECT doc_id % 50 AS a, doc_id AS b FROM documents WHERE doc_id % 50 <> doc_id
  UNION ALL
  SELECT doc_id % 75 AS a, doc_id AS b FROM documents WHERE doc_id % 75 <> doc_id
)
""".strip()


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    parent = d.where("doc_id % 50 <> doc_id").select(
        F.expr("doc_id % 50").alias("a"), F.col("doc_id").alias("b")
    )
    hub = d.where("doc_id % 75 <> doc_id").select(
        F.expr("doc_id % 75").alias("a"), F.col("doc_id").alias("b")
    )
    return parent.unionAll(hub)


@register(
    "graph-degree-distribution",
    f"""
WITH {EDGES_CTE},
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges
  ) GROUP BY node
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
""".strip(),
    doc="Degree histogram of the crawl link graph (undirected, self-loops "
    "dropped): two hash-aggs, fully parallel — the standard first look at "
    "any web graph's skew before sizing joins over it.",
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("a").alias("node")).unionAll(
        e.select(F.col("b").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


@register(
    "graph-jaccard-neighbors",
    f"""
WITH {EDGES_CTE},
adj AS (
  SELECT DISTINCT a AS node, b AS nbr FROM edges
  UNION
  SELECT DISTINCT b AS node, a AS nbr FROM edges
),
deg AS (SELECT node, count(*) AS degree FROM adj GROUP BY node),
small AS (
  SELECT adj.node, adj.nbr FROM adj
  JOIN deg ON deg.node = adj.nbr
  WHERE deg.degree <= {config.GRAPH_MAX_DEGREE}
),
common AS (
  SELECT x.node AS u, y.node AS v, count(*) AS common
  FROM small x JOIN small y ON x.nbr = y.nbr AND x.node < y.node
  GROUP BY x.node, y.node HAVING count(*) >= 2
)
SELECT u, v, CAST(common AS BIGINT) AS common,
       round(CAST(common AS DOUBLE)
             / (du.degree + dv.degree - common), 4) AS jaccard
FROM common
JOIN deg du ON du.node = u
JOIN deg dv ON dv.node = v
""".strip(),
    doc="Common-neighbor / Jaccard link prediction over the crawl graph. "
    "Candidate generation is the adjacency self-join keyed on the SHARED "
    "NEIGHBOR — never all-pairs — and hub neighbors above "
    "config.GRAPH_MAX_DEGREE are excluded first (a degree-d hub fans out "
    "d² pairs; same hygiene as the dedup shingle df cap). Degrees join "
    "back broadcast-side. ≥2 common neighbors keeps the pair table sparse.",
)
def q_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .distinct()
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("degree"))
    small = adj.join(
        F.broadcast(
            deg.where(F.col("degree") <= config.GRAPH_MAX_DEGREE).select(
                F.col("node").alias("nbr")
            )
        ),
        "nbr",
    )
    x = small.select(F.col("node").alias("u"), "nbr")
    y = small.select(F.col("node").alias("v"), "nbr")
    common = (
        x.join(y, "nbr")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= 2)
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    return (
        common.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            F.col("common").cast("bigint").alias("common"),
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
    )


@register(
    "sample-perplexity-buckets",
    f"""
WITH {TOKS_CTE},
{lm.oracle_lm_ctes("toks")},
lp AS MATERIALIZED (
  SELECT t.doc_id, d.lang, round(avg(t.lp), 3) AS lp
  FROM lmtoks t JOIN documents d ON t.doc_id = d.doc_id
  GROUP BY t.doc_id, d.lang
),
hist AS (
  SELECT lang, lp, CAST(count(*) AS BIGINT) AS c FROM lp GROUP BY lang, lp
),
cum AS (
  SELECT lang, lp, c,
         CAST(sum(c) OVER (PARTITION BY lang ORDER BY lp DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cm
  FROM hist
),
tot2 AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY lang),
cuts AS (
  SELECT h.lang,
         min(CASE WHEN h.cm >= (t.n + 2) // 3 THEN h.lp END) AS t1,
         min(CASE WHEN h.cm >= (2 * t.n + 2) // 3 THEN h.lp END) AS t2
  FROM cum h JOIN tot2 t USING (lang) GROUP BY h.lang
)
SELECT l.lang,
       CASE WHEN l.lp > c.t1 THEN 'head'
            WHEN l.lp > c.t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(l.lp) AS min_lp, max(l.lp) AS max_lp
FROM lp l JOIN cuts c USING (lang)
GROUP BY l.lang, CASE WHEN l.lp > c.t1 THEN 'head'
                      WHEN l.lp > c.t2 THEN 'middle'
                      ELSE 'tail' END
""".strip(),
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020, public): "
    "per language, docs split into head/middle/tail thirds by LM quality "
    "score (the CAPPED self-trained unigram avg-logprob of operators/lm "
    "— top-K + OOV bucket, bounded broadcast at any corpus size; a "
    "pretrained KenLM table is the drop-in swap). The tertile cuts are "
    "EXACT but "
    "computed from a VALUE HISTOGRAM of the 3-decimal-rounded scores "
    "(bounded domain), not a per-lang ranking window over the corpus — "
    "the agg-mad-outliers discipline: the ordered window runs over "
    "O(distinct score values) histogram rows per language, and the cut "
    "table (2 values per lang) broadcasts back onto the doc stream. "
    "Ties at a cut value land in one bucket deterministically (strict "
    "> on the cut) in both engines.",
)
def q_sample_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    # eager cut (the warc-corpus discipline): lp feeds the tertile-cut
    # chain AND the final bucket join; hist feeds cum and tot2 above it.
    # Uncut, the whole self-trained-LM chain (corpus tokenize + vocab
    # aggregate + broadcast + per-doc score) re-ran once per subtree
    # (34 Exchanges). The checkpointed frame is one narrow row per doc
    # (measured at 8 cores, sf0.1: 1.67 -> 1.34 s min-of-5).
    lp = eager_cut(
        lm.avg_logprob(toks)
        .select("doc_id", F.col("avg_logprob").alias("lp"))
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    hist = lp.groupBy("lang", "lp").agg(F.count("*").cast("long").alias("c"))
    wcum = (
        Window.partitionBy("lang")
        .orderBy(F.desc("lp"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "lang", "lp", "c", F.sum("c").over(wcum).cast("long").alias("cm")
    )
    tot2 = hist.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    cuts = (
        cum.join(F.broadcast(tot2), "lang")
        .groupBy("lang")
        .agg(
            F.min(
                F.when(
                    F.col("cm") >= F.expr("(n + 2) div 3"), F.col("lp")
                )
            ).alias("t1"),
            F.min(
                F.when(
                    F.col("cm") >= F.expr("(2 * n + 2) div 3"), F.col("lp")
                )
            ).alias("t2"),
        )
    )
    bucket = (
        F.when(F.col("lp") > F.col("t1"), "head")
        .when(F.col("lp") > F.col("t2"), "middle")
        .otherwise("tail")
    )
    return (
        lp.join(F.broadcast(cuts), "lang")
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("lp").alias("min_lp"),
            F.max("lp").alias("max_lp"),
        )
    )


# --- PMI collocations ------------------------------------------------------------

_PMI_MIN_SUPPORT = 3

_PMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     w -> w <> '') AS ws
  FROM documents
),
bigr AS (
  SELECT doc_id, unnest(
    list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                   i -> ws[i] || ' ' || ws[i + 1])
  ) AS pair
  FROM toks
),
split_ AS (
  SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
  FROM bigr
),
cab AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n_pair
  FROM split_ GROUP BY a, b
),
ca AS (SELECT a, CAST(count(*) AS BIGINT) AS n_a FROM split_ GROUP BY a),
cb AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b FROM split_ GROUP BY b),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM split_)
SELECT cab.a AS word_a, cab.b AS word_b, cab.n_pair,
       ca.n_a AS n_a_first, cb.n_b AS n_b_second,
       CAST(floor(1000000.0 * ((CAST(cab.n_pair AS DOUBLE) * tot.n) /
            (CAST(ca.n_a AS DOUBLE) * cb.n_b))) AS BIGINT) AS pmi_ratio_ppm
FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot
WHERE cab.n_pair >= {_PMI_MIN_SUPPORT}
ORDER BY pmi_ratio_ppm DESC, word_a ASC, word_b ASC
LIMIT 50
""".strip()


@register(
    "text-collocations-pmi",
    _PMI_ORACLE,
    doc="Bigram collocation mining by pointwise mutual information over "
    "the document corpus (the classic collocation detector; vocabulary "
    "construction's phrase-level sibling — agg-vocab-topk finds frequent "
    "TOKENS, this finds word pairs that co-occur far above chance, the "
    "standard pre-tokenizer step for multi-word vocabulary entries). "
    "PMI is reported as the probability RATIO p(a,b)/(p(a)p(b)) in ppm "
    "rather than its log: the ratio needs only IEEE double mul/div of "
    "exact integer counts (bit-identical cross-engine) where ln() would "
    "need the rounding convention; ordering by ratio == ordering by PMI "
    "(ln is monotone). Marginals are bigram-stream marginals (first/"
    "second position), min support {MS}. Plan: one explode into pair "
    "strings, three hash aggregates, two broadcast-sized joins against "
    "the aggregated marginals, TakeOrderedAndProject — the token "
    "explode is the only corpus-sized stage, identical to the "
    "vocabulary build's.".replace("{MS}", str(_PMI_MIN_SUPPORT)),
)
def q_text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '[^a-z]+'), w -> w <> '')"
        ).alias("ws"),
    )
    bigr = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ws) - 1, 0)), "
                "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        ).alias("pair")
    ).select(
        F.expr("split_part(pair, ' ', 1)").alias("a"),
        F.expr("split_part(pair, ' ', 2)").alias("b"),
    )
    # ONE corpus pass: the margins and the total all derive from the
    # persisted (a, b, n_pair) aggregate — n_a = Σ n_pair over b, etc.,
    # exact integer sums. The old shape scanned the bigram stream four
    # times (pair counts + both margins + total), each replaying the
    # regex tokenize + bigram fold; the cached frame is distinct-bigram
    # sized (Heaps-sublinear — the artifact caching exists for), never
    # the corpus stream. Round-8 A/B at sf0.1: 2.39 → 0.46 s warm.
    from ai_knowledge_etl_spark.session import track_persist

    cab = track_persist(bigr.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("n_pair")
    ))
    ca = cab.groupBy("a").agg(F.sum("n_pair").cast("long").alias("n_a"))
    cb = cab.groupBy("b").agg(F.sum("n_pair").cast("long").alias("n_b"))
    tot = cab.agg(F.sum("n_pair").cast("long").alias("n"))
    return (
        cab.where(F.col("n_pair") >= _PMI_MIN_SUPPORT)
        .join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("word_a"),
            F.col("b").alias("word_b"),
            "n_pair",
            F.col("n_a").alias("n_a_first"),
            F.col("n_b").alias("n_b_second"),
            F.floor(
                F.lit(1000000.0)
                * (F.col("n_pair").cast("double") * F.col("n"))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).cast("long").alias("pmi_ratio_ppm"),
        )
        .orderBy(
            F.desc("pmi_ratio_ppm"), F.asc("word_a"), F.asc("word_b")
        )
        .limit(50)
    )


@register(
    "text-bigram-perplexity",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pos AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM words
),
bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM pos),
bgc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bgc GROUP BY w1),
v AS (
  SELECT count(DISTINCT w) AS vsize
  FROM (SELECT unnest(ws) AS w FROM words)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((CAST(c12 AS DOUBLE) + 1) / (c1 + vsize))), 3)
         AS avg_nll
FROM bg JOIN bgc USING (w1, w2) JOIN ctx USING (w1), v
GROUP BY doc_id
""".strip(),
    doc="Bigram-LM perplexity scoring (the CCNet/KenLM quality signal one "
    "order up from udf-unigram-logprob): the corpus's own bigram "
    "distribution with add-1 smoothing scores every document by average "
    "negative log-likelihood of its transitions — word salad scores "
    "high, templated boilerplate near zero. Spark plan: bigrams come "
    "from an ARRAY transform (ws[i-1], ws[i]) exploded per doc — no "
    "window, no per-doc shuffle, the bigram stream is as parallel as "
    "the scan; counts hash-aggregate; the bigram table and its w1 "
    "context marginals broadcast back onto the stream (at 100 TB the "
    "counts table IS the pretrained LM artifact you ship — swap the "
    "self-trained table for KenLM's, identical plan). Context counts "
    "derive from the bigram counts (one aggregate, not two corpus "
    "passes).",
)
def q_text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    bg = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ctx = bgc.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    vsize = words.select(F.explode("ws").alias("w")).agg(
        F.countDistinct("w").alias("vsize")
    )
    return (
        bg.join(F.broadcast(bgc), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(
                F.avg(
                    -F.log(
                        (F.col("c12").cast("double") + 1)
                        / (F.col("c1") + F.col("vsize"))
                    )
                ),
                3,
            ).alias("avg_nll"),
        )
    )


@register(
    "agg-eval-metrics",
    f"""
WITH probe AS (
  SELECT doc_id, {syn.REPEAT_TEXT_EXPR} AS text FROM documents
),
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM probe
          WHERE text IS NOT NULL),
tri AS (
  SELECT doc_id,
         greatest(len(ws) - 2, 1) AS t3,
         len(list_distinct(list_transform(
             generate_series(1, greatest(len(ws) - 2, 1)),
             i -> array_to_string(ws[i:i+2], ' ')))) AS d3
  FROM words
),
tw AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS w FROM words) GROUP BY doc_id, w
),
top AS (SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS n_tokens
        FROM tw GROUP BY doc_id),
judged AS (
  SELECT tri.doc_id,
         NOT (1.0 - CAST(d3 AS DOUBLE) / t3 <= {config.GOPHER_DUP3_MAX}
              AND CAST(mx AS DOUBLE) / n_tokens <= {config.GOPHER_TOPWORD_MAX})
           AS pred_spam,
         (tri.doc_id % 8 = 0) AS is_spam
  FROM tri JOIN top USING (doc_id)
),
cm AS (
  SELECT CAST(sum(CASE WHEN pred_spam AND is_spam THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN pred_spam AND NOT is_spam THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN NOT pred_spam AND is_spam THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN NOT pred_spam AND NOT is_spam THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM judged
)
SELECT tp, fp, fn, tn,
       CAST(CASE WHEN tp + fp = 0 THEN 0
                 ELSE (1000000 * tp) // (tp + fp) END AS BIGINT) AS precision_ppm,
       CAST(CASE WHEN tp + fn = 0 THEN 0
                 ELSE (1000000 * tp) // (tp + fn) END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN (2 * tp + fp + fn) = 0 THEN 0
                 ELSE (2000000 * tp) // (2 * tp + fp + fn) END AS BIGINT) AS f1_ppm
FROM cm
""".strip(),
    doc="Filter-evaluation metrics: confusion matrix + precision/recall/F1 "
    "of the Gopher repetition gate against the spam-injection ground "
    "truth (synthetic.REPEAT_TEXT_EXPR plants the positives, so labels "
    "are exact) — the report every production quality filter ships "
    "with before it is allowed to delete corpus mass. All ratios in "
    "integer ppm via the direct F1 identity 2tp/(2tp+fp+fn) — no float "
    "division, no ulp edge. One corpus pass (the gate) + one global "
    "aggregate; associative and partitioning-invariant at any scale.",
)
def q_agg_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    gate = q_repetition_gopher(spark, sf_dir)
    judged = gate.select(
        "doc_id",
        (~F.col("keep")).alias("pred_spam"),
        (F.col("doc_id") % 8 == 0).alias("is_spam"),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    cm = judged.agg(
        cnt(F.col("pred_spam") & F.col("is_spam")).alias("tp"),
        cnt(F.col("pred_spam") & ~F.col("is_spam")).alias("fp"),
        cnt(~F.col("pred_spam") & F.col("is_spam")).alias("fn"),
        cnt(~F.col("pred_spam") & ~F.col("is_spam")).alias("tn"),
    )
    ratio = lambda num, den: F.when(den == 0, F.lit(0)).otherwise(  # noqa: E731
        F.expr(num)
    ).cast("long")
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        ratio("(1000000 * tp) div (tp + fp)", F.col("tp") + F.col("fp")).alias(
            "precision_ppm"
        ),
        ratio("(1000000 * tp) div (tp + fn)", F.col("tp") + F.col("fn")).alias(
            "recall_ppm"
        ),
        ratio(
            "(2000000 * tp) div (2 * tp + fp + fn)",
            2 * F.col("tp") + F.col("fp") + F.col("fn"),
        ).alias("f1_ppm"),
    )
