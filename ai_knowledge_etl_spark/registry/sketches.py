"""Mergeable-sketch family: count-min frequency, KMV/bottom-k distinct with
set operations, bloom-gated incremental dedup.

Why these are first-class at 100 TB: each replaces an exact structure whose
state grows with the data (a counter per key, a distinct set, a visited
set) with a FIXED-size, MERGEABLE summary built from plain hash aggregates
— per-day/per-partition sketches combine without rescanning raw data, and
the merged sketch answers the query at a bounded error. The reference keeps
only the exact forms (visited set, scripts/crawler-queue.sh:36-41; queue
stats, commands/extract.md); these are the sub-linear-state twins.

Every estimate uses the dialect-common md5-slice hash
(operators/sketches.py), so the DuckDB oracles replay the EXACT estimate
values — full-value parity, not bound-checks. Retrieval/accuracy quality is
gated separately in tests/test_sketches.py (CMS never undercounts; KMV
within tolerance of exact at fixture scale; bloom has zero false
negatives)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import sketches as SK
from ai_knowledge_etl_spark.registry import register
from ai_knowledge_etl_spark.session import eager_cut
from ai_knowledge_etl_spark.sources.catalog import load_table

# --- count-min heavy hitters ----------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 1024


def _cms_probe_union(width: int) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT key, cnt, {d} AS d, "
        f"{SK.duck_cms_bucket('key', d, width)} AS bucket FROM keyed"
        for d in range(_CMS_DEPTH)
    )


_CMS_ORACLE = f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
probes AS MATERIALIZED (
{_cms_probe_union(_CMS_WIDTH)}
),
cells AS (
  SELECT d, bucket, CAST(sum(cnt) AS BIGINT) AS total
  FROM probes GROUP BY d, bucket
),
est AS (
  SELECT p.key, CAST(min(c.total) AS BIGINT) AS est
  FROM probes p JOIN cells c USING (d, bucket) GROUP BY p.key
)
SELECT k.key AS user_key, k.cnt AS exact_cnt, e.est AS est_cnt,
       e.est >= k.cnt AS never_under
FROM keyed k JOIN est e ON k.key = e.key
ORDER BY exact_cnt DESC, user_key ASC
LIMIT 40
""".strip()


@register(
    "agg-countmin-heavyhitters",
    _CMS_ORACLE,
    doc="Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005) "
    f"over per-user event counts: a {_CMS_DEPTH}x{_CMS_WIDTH} counter grid "
    "built by two hash aggregates (key counts, then cell sums — the grid "
    "is mergeable across partitions/days by a further cell-wise sum), "
    "point estimates by broadcast-joining the probe keys against the "
    "4096-row grid and taking min over rows. The never_under column is "
    "the CMS one-sided guarantee (est >= exact, always) — a FALSE "
    "anywhere breaks the oracle hash. At 100 TB the grid is the only "
    "state that crosses days; estimation never shuffles the probe side.",
)
def q_agg_countmin_heavyhitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key")
    )
    keyed = ev.groupBy("key").agg(F.count("*").cast("long").alias("cnt"))
    grid = SK.cms_table(
        keyed, "key", "cnt", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    est = SK.cms_estimate(
        keyed.select("key"), grid, "key", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    out = keyed.join(est, "key").select(
        F.col("key").alias("user_key"),
        F.col("cnt").alias("exact_cnt"),
        F.col("est").alias("est_cnt"),
        (F.col("est") >= F.col("cnt")).alias("never_under"),
    )
    return out.orderBy(F.desc("exact_cnt"), F.asc("user_key")).limit(40)


# --- KMV distinct + set operations ----------------------------------------------

_KMV_K = 64
_KMV_HASH = SK.duck_md5_slice("CAST(user_id AS VARCHAR)", 1, 12)

_KMV_ORACLE = f"""
WITH h AS MATERIALIZED (
  SELECT DISTINCT event_type AS set_id, {_KMV_HASH} AS h FROM events
),
cnts AS (SELECT set_id, CAST(count(*) AS BIGINT) AS n_h FROM h GROUP BY 1),
surv AS (
  SELECT h.set_id, h.h FROM h JOIN cnts USING (set_id)
  WHERE h.h < least({SK.KMV_MAX},
        CAST(floor(CAST({SK.KMV_MAX} AS DOUBLE) * {5.0 * _KMV_K} / n_h)
             AS BIGINT) + 1)
),
sk AS MATERIALIZED (
  SELECT set_id, h,
         row_number() OVER (PARTITION BY set_id ORDER BY h ASC) AS rn
  FROM surv QUALIFY rn <= {_KMV_K}
),
est AS (
  SELECT set_id, count(*) AS n_in,
         max(CASE WHEN rn = {_KMV_K} THEN h END) AS kth
  FROM sk GROUP BY 1
),
estv AS (
  SELECT set_id,
         CASE WHEN n_in < {_KMV_K} THEN CAST(n_in AS BIGINT)
              ELSE CAST(floor({_KMV_K - 1}.0 *
                              CAST({SK.KMV_MAX} AS DOUBLE) / kth)
                        AS BIGINT) END AS est_distinct
  FROM est
),
pairs AS (
  SELECT a.set_id AS ta, b.set_id AS tb
  FROM cnts a JOIN cnts b ON a.set_id < b.set_id
),
m AS (
  SELECT DISTINCT x.ta, x.tb, x.h FROM (
    SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.set_id = p.ta
    UNION ALL
    SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.set_id = p.tb
  ) x
),
mk AS MATERIALIZED (
  SELECT ta, tb, h,
         row_number() OVER (PARTITION BY ta, tb ORDER BY h ASC) AS rn
  FROM m QUALIFY rn <= {_KMV_K}
),
mflag AS (
  SELECT mk.ta, mk.tb, mk.h, mk.rn,
         (sa.h IS NOT NULL) AS ina, (sb.h IS NOT NULL) AS inb
  FROM mk
  LEFT JOIN sk sa ON sa.set_id = mk.ta AND sa.h = mk.h
  LEFT JOIN sk sb ON sb.set_id = mk.tb AND sb.h = mk.h
),
magg AS (
  SELECT ta, tb, count(*) AS k_used,
         max(CASE WHEN rn = {_KMV_K} THEN h END) AS kth_u,
         CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT) AS j
  FROM mflag GROUP BY ta, tb
),
uest AS (
  SELECT ta, tb, j, k_used,
         CASE WHEN k_used < {_KMV_K} THEN CAST(k_used AS BIGINT)
              ELSE CAST(floor({_KMV_K - 1}.0 *
                              CAST({SK.KMV_MAX} AS DOUBLE) / kth_u)
                        AS BIGINT) END AS est_union
  FROM magg
),
exu AS (
  SELECT p.ta, p.tb,
         CAST(count(DISTINCT h.h) AS BIGINT) AS exact_union
  FROM pairs p JOIN h ON h.set_id = p.ta OR h.set_id = p.tb
  GROUP BY p.ta, p.tb
),
exi AS (
  SELECT a.set_id AS ta, b.set_id AS tb,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM h a JOIN h b ON a.h = b.h AND a.set_id < b.set_id
  GROUP BY 1, 2
)
SELECT u.ta AS type_a, u.tb AS type_b,
       ca.n_h AS exact_a, ea.est_distinct AS est_a,
       cb.n_h AS exact_b, eb.est_distinct AS est_b,
       exu.exact_union, u.est_union,
       coalesce(exi.exact_inter, 0) AS exact_inter,
       CAST(floor(CAST(u.j AS DOUBLE) * u.est_union / u.k_used) AS BIGINT)
         AS est_inter
FROM uest u
JOIN cnts ca ON ca.set_id = u.ta
JOIN cnts cb ON cb.set_id = u.tb
JOIN estv ea ON ea.set_id = u.ta
JOIN estv eb ON eb.set_id = u.tb
JOIN exu ON exu.ta = u.ta AND exu.tb = u.tb
LEFT JOIN exi ON exi.ta = u.ta AND exi.tb = u.tb
ORDER BY type_a, type_b
""".strip()


@register(
    "agg-kmv-distinct-setops",
    _KMV_ORACLE,
    doc="KMV / bottom-k distinct sketches with set operations (Bar-Yossef "
    "et al. 2002; the theta-sketch core): per event_type keep the "
    f"{_KMV_K} smallest 48-bit hashes of user_id; (k-1)*MAX/kth_min "
    "estimates the distinct count, and for every type pair the sketches "
    "MERGE — union cardinality from the merged bottom-k, intersection "
    "from the fraction of merged-k hashes present in both — without "
    "touching raw events again (the capability approx_count_distinct "
    "lacks, and the reason day-grain KMV tables compose into any window "
    "at 100 TB). Scale path: the per-set ranking window only ever sees "
    "the ~5k smallest hashes via an exact count-derived cutoff (any hash "
    "below the cutoff is smaller than every hash above it, so the k "
    "smallest survivors are the k smallest overall). Estimates degrade "
    "to exact when a sketch is not full. The oracle replays every "
    "estimate value exactly; accuracy floors are pytest-gated "
    "(tests/test_sketches.py).",
)
def q_agg_kmv_distinct_setops(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    # eager cuts (the warc-corpus discipline): the distinct hash table h
    # feeds SEVEN subtrees (sketch counts + survivors, per-set counts,
    # both exact-union sides, both exact-intersection sides) and the
    # bottom-k sketch feeds five more (estimates, merge sides, member
    # flags) — uncut, each consumer re-ran the md5+distinct shuffle over
    # the full events table (65 Exchanges in the plan; 7 full scans at
    # any scale). h is narrow (set_id + 8-byte hash); sk is ~k rows/set.
    h = eager_cut(SK.kmv_hashes(ev, "event_type", "user_id"))
    sk = eager_cut(SK.kmv_sketch(h, k=_KMV_K))
    estv = SK.kmv_estimate(sk, k=_KMV_K).select("set_id", "est_distinct")
    cnts = h.groupBy("set_id").agg(
        F.count("*").cast("long").alias("n_h")
    )
    pairs = (
        cnts.select(F.col("set_id").alias("ta"))
        .join(cnts.select(F.col("set_id").alias("tb")))
        .where(F.col("ta") < F.col("tb"))
    )
    ma = pairs.join(
        sk.select(F.col("set_id").alias("ta"), "h"), "ta"
    ).select("ta", "tb", "h")
    mb = pairs.join(
        sk.select(F.col("set_id").alias("tb"), "h"), "tb"
    ).select("ta", "tb", "h")
    m = ma.unionByName(mb).distinct()
    wp = Window.partitionBy("ta", "tb").orderBy(F.asc("h"))
    mk = (
        m.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= _KMV_K)
    )
    sa = sk.select(F.col("set_id").alias("ta"), F.col("h"), F.lit(True).alias("ina"))
    sb = sk.select(F.col("set_id").alias("tb"), F.col("h"), F.lit(True).alias("inb"))
    mflag = (
        mk.join(sa, ["ta", "h"], "left")
        .join(sb, ["tb", "h"], "left")
        .select(
            "ta", "tb", "rn",
            F.coalesce("ina", F.lit(False)).alias("ina"),
            F.coalesce("inb", F.lit(False)).alias("inb"),
            "h",
        )
    )
    magg = mflag.groupBy("ta", "tb").agg(
        F.count("*").alias("k_used"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth_u"),
        F.sum(
            F.when(F.col("ina") & F.col("inb"), 1).otherwise(0)
        ).cast("long").alias("j"),
    )
    uest = magg.select(
        "ta", "tb", "j", "k_used",
        F.when(
            F.col("k_used") < _KMV_K, F.col("k_used").cast("long")
        )
        .otherwise(
            F.floor(
                F.lit(float(_KMV_K - 1))
                * F.lit(float(SK.KMV_MAX))
                / F.col("kth_u")
            ).cast("long")
        )
        .alias("est_union"),
    )
    ha = h.select(F.col("set_id").alias("ta"), "h")
    hb = h.select(F.col("set_id").alias("tb"), "h")
    exu = (
        pairs.join(ha, "ta")
        .select("ta", "tb", "h")
        .unionByName(pairs.join(hb, "tb").select("ta", "tb", "h"))
        .distinct()
        .groupBy("ta", "tb")
        .agg(F.count("*").cast("long").alias("exact_union"))
    )
    exi = (
        ha.join(hb, "h")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    out = (
        uest.join(cnts.select(F.col("set_id").alias("ta"), F.col("n_h").alias("exact_a")), "ta")
        .join(cnts.select(F.col("set_id").alias("tb"), F.col("n_h").alias("exact_b")), "tb")
        .join(estv.select(F.col("set_id").alias("ta"), F.col("est_distinct").alias("est_a")), "ta")
        .join(estv.select(F.col("set_id").alias("tb"), F.col("est_distinct").alias("est_b")), "tb")
        .join(exu, ["ta", "tb"])
        .join(exi, ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "exact_a", "est_a", "exact_b", "est_b",
            "exact_union", "est_union",
            F.coalesce("exact_inter", F.lit(0)).cast("long").alias(
                "exact_inter"
            ),
            F.floor(
                F.col("j") * F.lit(1.0) * F.col("est_union")
                / F.col("k_used")
            ).cast("long").alias("est_inter"),
        )
    )
    return out.orderBy("type_a", "type_b")


# --- bloom-gated incremental dedup ----------------------------------------------

_BLOOM_M = 32768
_BLOOM_J = 3

_BLOOM_POS = [
    SK.duck_md5_slice("fp", 1 + 5 * i, 5) + f" % {_BLOOM_M}"
    for i in range(_BLOOM_J)
]

_BLOOM_ORACLE = f"""
WITH hist AS MATERIALIZED (SELECT doc_id, md5(text) AS fp FROM documents),
arr AS MATERIALIZED (
  SELECT doc_id + 30000000 AS arr_id, md5(text) AS fp
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 40000000 AS arr_id, md5(text || ' v2') AS fp
  FROM documents WHERE doc_id % 7 = 3
),
bits AS MATERIALIZED (
  SELECT DISTINCT bit FROM (
    SELECT {_BLOOM_POS[0]} AS bit FROM hist
    UNION ALL SELECT {_BLOOM_POS[1]} AS bit FROM hist
    UNION ALL SELECT {_BLOOM_POS[2]} AS bit FROM hist
  )
),
cand AS (
  SELECT arr_id, fp,
         ({_BLOOM_POS[0]}) IN (SELECT bit FROM bits)
     AND ({_BLOOM_POS[1]}) IN (SELECT bit FROM bits)
     AND ({_BLOOM_POS[2]}) IN (SELECT bit FROM bits) AS bloom_hit
  FROM arr
),
dup AS (SELECT DISTINCT a.arr_id FROM arr a JOIN hist h ON a.fp = h.fp)
SELECT c.arr_id, c.bloom_hit,
       c.bloom_hit AND d.arr_id IS NOT NULL AS is_dup,
       c.bloom_hit AND d.arr_id IS NULL AS false_pos
FROM cand c LEFT JOIN dup d USING (arr_id)
ORDER BY arr_id
""".strip()


@register(
    "dedup-bloom-gate",
    _BLOOM_ORACLE,
    doc="Bloom-gated incremental dedup (Bloom 1970): arriving documents "
    f"are screened against a {_BLOOM_M}-bit / {_BLOOM_J}-hash filter "
    "built from the historical corpus fingerprints; only bloom HITS pay "
    "the exact fingerprint join, definite-new rows skip it entirely. The "
    "bit table is <= m rows — broadcastable, mergeable across corpus "
    "shards by plain DISTINCT union — so at 100 TB the arrival stream "
    "never shuffles against history unless the filter says maybe. The "
    "probe corpus injects true dups (cloned %7=0 docs) and true news "
    "(' v2'-perturbed %7=3 docs); no-false-negative is structural "
    "(every dup's bits were set by its own history twin) and the "
    "false_pos column makes the FP price visible and oracle-checked. "
    "Complements dedup-exact (full-corpus batch) with the arrival-time "
    "gate; reference analog: the crawler's exact visited set "
    "(scripts/crawler-queue.sh:36-41).",
)
def q_dedup_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.select("doc_id", F.md5("text").alias("fp"))
    dups = docs.where("doc_id % 7 = 0").select(
        (F.col("doc_id") + 30000000).alias("arr_id"),
        F.md5("text").alias("fp"),
    )
    news = docs.where("doc_id % 7 = 3").select(
        (F.col("doc_id") + 40000000).alias("arr_id"),
        F.md5(F.concat(F.col("text"), F.lit(" v2"))).alias("fp"),
    )
    arr = dups.unionByName(news)
    bits = SK.bloom_bits(hist, "fp", m=_BLOOM_M, j=_BLOOM_J)
    cand = SK.bloom_candidates(
        arr, bits, "fp", "arr_id", m=_BLOOM_M, j=_BLOOM_J
    )
    # the gate: ONLY bloom hits reach the exact fingerprint join
    confirmed = (
        cand.where("bloom_hit")
        .join(arr, "arr_id")
        .join(hist.select("fp").distinct(), "fp", "left_semi")
        .select("arr_id", F.lit(True).alias("dup"))
    )
    return (
        cand.join(confirmed, "arr_id", "left")
        .select(
            "arr_id",
            "bloom_hit",
            F.coalesce("dup", F.lit(False)).alias("is_dup"),
            (F.col("bloom_hit") & F.coalesce(~F.col("dup"), F.lit(True))).alias(
                "false_pos"
            ),
        )
        .orderBy("arr_id")
    )


# --- bottom-k uniform sample -> mergeable quantiles -----------------------------

_QS_K = 256
_QS_HASH = SK.duck_md5_slice("CAST(o_orderkey AS VARCHAR)", 1, 12)

_QS_ORACLE = f"""
WITH hashed AS (
  SELECT o_orderpriority AS grp, CAST(o_totalprice AS DECIMAL(12,2)) AS v,
         {_QS_HASH} AS h
  FROM orders
),
counts AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_rows FROM hashed GROUP BY 1
),
surv AS (
  SELECT hashed.grp, v, h FROM hashed JOIN counts USING (grp)
  WHERE h < least({SK.KMV_MAX},
        CAST(floor(CAST({SK.KMV_MAX} AS DOUBLE) * {5.0 * _QS_K} / n_rows)
             AS BIGINT) + 1)
),
sk AS MATERIALIZED (
  SELECT grp, v, h,
         row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS rn
  FROM surv QUALIFY rn <= {_QS_K}
),
ks AS (SELECT grp, CAST(max(rn) AS BIGINT) AS k_used FROM sk GROUP BY 1),
vr AS (
  SELECT grp, v,
         row_number() OVER (PARTITION BY grp ORDER BY v ASC, h ASC) AS vr
  FROM sk
),
sel AS (
  SELECT grp, k_used,
         (50 * (k_used - 1)) // 100 + 1 AS r50,
         (90 * (k_used - 1)) // 100 + 1 AS r90
  FROM ks
)
SELECT s.grp AS priority, c.n_rows, s.k_used,
       CAST(max(CASE WHEN v.vr = s.r50 THEN v.v END) AS DECIMAL(12,2))
         AS p50_price,
       CAST(max(CASE WHEN v.vr = s.r90 THEN v.v END) AS DECIMAL(12,2))
         AS p90_price
FROM sel s JOIN vr v ON v.grp = s.grp JOIN counts c ON c.grp = s.grp
GROUP BY s.grp, c.n_rows, s.k_used
ORDER BY priority
""".strip()


@register(
    "agg-quantile-sample-merge",
    _QS_ORACLE,
    doc="Mergeable quantile estimation from a bottom-k uniform row sample "
    f"(operators/sketches.bottomk_sample, k={_QS_K}): rows rank by "
    "md5(orderkey) — a fixed random permutation independent of the value "
    "column — and the k smallest ranks per priority group form an exact "
    "uniform sample whose order statistics estimate any quantile. The "
    "sample MERGES (bottom-k of a union = re-ranked bottom-k of "
    "concatenated bottom-k's, proven in tests/test_sketches.py), so "
    "per-day samples compose into any-window quantiles without "
    "rescanning — the deterministic, mergeable complement of t-digest "
    "(agg-approx-percentile-gate). Rank selection is type-1 (no "
    "interpolation, no division): r_p = (p*(k-1)) div 100 + 1 into the "
    "value-sorted sample. Scale: same count-derived hash cutoff as KMV — "
    "the ranking window never sees the full group. Accuracy CDF-gated "
    "in tests/test_sketches.py.",
)
def q_agg_quantile_sample_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("v"),
    )
    # persisted: the sample feeds both the k_used aggregate and the
    # value-rank window — unpersisted, the bottom-k md5-rank window over
    # the full orders table replays twice. The cached frame is k rows
    # per group (the sketch artifact, constant at any corpus size).
    # Round-8 A/B at sf0.1: 1.56 → 0.60 s warm.
    from ai_knowledge_etl_spark.session import track_persist

    sample = track_persist(SK.bottomk_sample(
        orders, "o_orderpriority", "o_orderkey", keep=("v",), k=_QS_K
    ))
    counts = orders.groupBy(
        F.col("o_orderpriority").alias("grp")
    ).agg(F.count("*").cast("long").alias("n_rows"))
    ks = sample.groupBy("grp").agg(
        F.max("rn").cast("long").alias("k_used")
    )
    wv = Window.partitionBy("grp").orderBy(F.asc("v"), F.asc("h"))
    vr = sample.withColumn("vr", F.row_number().over(wv))
    sel = ks.select(
        "grp",
        "k_used",
        (F.expr("(50 * (k_used - 1)) div 100") + 1).alias("r50"),
        (F.expr("(90 * (k_used - 1)) div 100") + 1).alias("r90"),
    )
    return (
        sel.join(vr, "grp")
        .join(F.broadcast(counts), "grp")
        .groupBy("grp", "n_rows", "k_used")
        .agg(
            F.max(F.when(F.col("vr") == F.col("r50"), F.col("v")))
            .cast("decimal(12,2)")
            .alias("p50_price"),
            F.max(F.when(F.col("vr") == F.col("r90"), F.col("v")))
            .cast("decimal(12,2)")
            .alias("p90_price"),
        )
        .select(
            F.col("grp").alias("priority"),
            "n_rows",
            "k_used",
            "p50_price",
            "p90_price",
        )
        .orderBy("priority")
    )
