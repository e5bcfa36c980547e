"""Training-data preparation operators: deterministic sampling, dataset
splits, sequence packing (SURVEY §2.I extension — no reference
counterpart; these are the ops a pretraining pipeline runs downstream of
the reference's extract stage). Parity conventions per registry/crawl.py;
all sampling is md5-hash-keyed so both engines select identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import packing, sampling
from ai_knowledge_etl_spark.registry import register
from ai_knowledge_etl_spark.session import eager_cut
from ai_knowledge_etl_spark.sources.catalog import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "sample-stratified",
    """
SELECT doc_id, source
FROM documents
WHERE substring(md5(CAST(doc_id AS STRING)), 1, 2) <
      CASE CAST(substring(source, 4) AS INTEGER) % 3
        WHEN 0 THEN '2a' WHEN 1 THEN '80' ELSE 'zz' END
ORDER BY doc_id
""".strip(),
    doc="Stratified sampling with per-stratum rates (~16% / 50% / 100% by "
    "source band), keyed on md5(doc_id) so the sample is identical across "
    "engines, runs, and partitionings — a narrow filter, no shuffle "
    "(operators/sampling.py).",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    band = (F.substring("source", 4, 10).cast("int") % 3)
    threshold = (
        F.when(band == 0, "2a").when(band == 1, "80").otherwise("zz")
    )
    return (
        sampling.stratified_sample(d, "doc_id", threshold)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@register(
    "sample-reservoir-group",
    """
SELECT doc_id, source, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rk
  FROM documents
) WHERE rk <= 5
""".strip(),
    doc="Deterministic per-group 'reservoir': the 5 docs per source with "
    "the smallest md5 tag — uniform within the group, stable across runs. "
    "One shuffle on the group key; Spark's window-TopK keeps per-group "
    "state O(k) (operators/sampling.py).",
)
def q_sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.reservoir_per_group(
        _docs(spark, sf_dir), "source", "doc_id", k=5
    ).select("doc_id", "source", F.col("rk").cast("int").alias("rk"))


def _balanced_oracle_sql() -> str:
    from ai_knowledge_etl_spark.operators.sketches import duck_md5_slice

    h = duck_md5_slice("CAST(e.event_id AS VARCHAR)", 1, 8)
    return f"""
WITH counts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
),
thr AS (SELECT event_type, n, min(n) OVER () AS mn FROM counts),
kept AS (
  SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_kept
  FROM events e JOIN thr t ON e.event_type = t.event_type
  WHERE CAST({h} AS DECIMAL(38,0)) * t.n
        < CAST(t.mn AS DECIMAL(38,0)) * 4294967296
  GROUP BY e.event_type
)
SELECT t.event_type, t.n AS n_orig,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM thr t LEFT JOIN kept k ON t.event_type = k.event_type
""".strip()


@register(
    "sample-balanced-classes",
    _balanced_oracle_sql(),
    doc="Class-balanced downsampling with DATA-DERIVED rates — the "
    "training-set rebalance stratified sampling (fixed rates) cannot "
    "express: each class keeps ~minority-count rows via the "
    "dialect-common md5-slice hash gated by EXACT "
    "cross-multiplication in DECIMAL(38,0) (h * class_n < min_n * "
    "16^8 — no float division, and 128-bit products cannot wrap even "
    "when a class exceeds 2^31 rows, where the old int64 form would "
    "silently overflow in Spark's non-ANSI mode while DuckDB raised; "
    "keep decisions are identical across engines, runs, and "
    "partitionings). Scale: the class-count dim is O(|classes|) "
    "rows (broadcast equi-join); the min attaches via a window over "
    "that same tiny pre-aggregated frame (allowlisted SinglePartition "
    "on O(classes) rows); the keep gate is a narrow filter — no "
    "shuffle of the corpus beyond the final per-class count.",
)
def q_sample_balanced_classes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from ai_knowledge_etl_spark.operators.sketches import md5_slice

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type"
    )
    counts = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    thr = counts.select(
        "event_type",
        "n",
        F.min("n").over(W.partitionBy()).cast("long").alias("mn"),
    )
    h = md5_slice(F.col("event_id").cast("string"), 1, 8)
    kept = (
        ev.join(F.broadcast(thr), "event_type")
        .where(
            h.cast("decimal(38,0)") * F.col("n")
            < F.col("mn").cast("decimal(38,0)") * F.lit(4294967296)
        )
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_kept"))
    )
    return (
        thr.join(kept, "event_type", "left")
        .select(
            "event_type",
            F.col("n").alias("n_orig"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


@register(
    "sample-train-split",
    """
SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT source,
         CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < 'cc'
                THEN 'train'
              WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < 'e6'
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
GROUP BY source, split
""".strip(),
    doc="Hash-keyed train/val/test split (~80/10/10): a row's split never "
    "depends on the rest of the dataset, so assignments survive appends "
    "and reprocessing — the property random splits lack. Summarized per "
    "(source, split) (operators/sampling.py train_val_test).",
)
def q_sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sampling.train_val_test(_docs(spark, sf_dir), "doc_id")
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "pack-sequences",
    """
SELECT doc_id, source, n_tok, cum_prev,
       CAST(cum_prev // 512 AS BIGINT) AS first_window,
       CAST((cum_prev + n_tok - 1) // 512 AS BIGINT) AS last_window,
       CAST((cum_prev + n_tok - 1) // 512 - cum_prev // 512 + 1 AS BIGINT)
         AS n_windows
FROM (
  SELECT doc_id, source, n_tok,
         CAST(coalesce(sum(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
    FROM documents
  )
)
""".strip(),
    doc="Concat-and-chunk sequence packing (GPT-style pretraining recipe): "
    "per-source token stream ordered by doc_id, cut into 512-token context "
    "windows; each doc learns the window span it lands in via one "
    "exclusive running cumsum (operators/packing.py). Per-stream "
    "partitioning keeps a 100 TB corpus packable with no global ordering.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    return packing.concat_chunk_pack(
        d, order_col="doc_id", tok_col="n_tok", budget=512,
        partition_col="source",
    ).select(
        "doc_id", "source", "n_tok", "cum_prev",
        "first_window", "last_window", "n_windows",
    )


@register(
    "udf-redact-pii",
    """
WITH pii AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS STRING)
              || '@mail.example.com or call +1 555-01'
              || CAST(doc_id % 90 + 10 AS STRING)
              || CASE WHEN doc_id % 5 = 0
                   THEN ' today. Card 4111111111111111.' ELSE ' today.' END
           AS text
  FROM documents
),
pass1 AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b[0-9]{13,16}\\b', '<CARD>', 'g') AS no_card
  FROM pii
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '\\b[0-9]{13,16}\\b')) AS INTEGER)
         AS n_cards,
       CAST(len(regexp_extract_all(no_card, '\\+?[0-9][0-9 ()\\-]{6,}[0-9]'))
         AS INTEGER) AS n_phones,
       md5(regexp_replace(no_card, '\\+?[0-9][0-9 ()\\-]{6,}[0-9]',
           '<PHONE>', 'g')) AS red_fp
FROM pass1
""".strip(),
    doc="PII redaction for training corpora: emails -> <EMAIL>, card "
    "numbers -> <CARD>, then phones -> <PHONE> (order matters — cards "
    "redact before the phone pattern can eat their digit runs). Counts "
    "per class + md5 of the redacted text prove both engines redact "
    "identically. Chained JVM regexp_replace, narrow map, no shuffle "
    "(functions/text.py redact_pii; patterns in Java-regex ∩ RE2).",
)
def q_udf_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.functions import text as TX

    d = _docs(spark, sf_dir)
    synth = F.concat(
        "text",
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call +1 555-01"),
        (F.col("doc_id") % 90 + 10).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, " today. Card 4111111111111111.")
        .otherwise(" today."),
    )
    p = d.select("doc_id", synth.alias("text"))
    n_emails, n_cards, n_phones = TX.pii_counts("text")
    return p.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_cards.alias("n_cards"),
        n_phones.alias("n_phones"),
        F.md5(TX.redact_pii("text")).alias("red_fp"),
    )


@register(
    "udf-grouped-zscore",
    """
SELECT doc_id, source,
       CAST(n_chars * cnt - total AS BIGINT) AS dev_n,
       CAST(row_number() OVER (
         PARTITION BY source
         ORDER BY n_chars * cnt - total, doc_id) AS INTEGER) AS rk
FROM (
  SELECT doc_id, source, n_chars,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cnt,
         CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS total
  FROM documents
)
""".strip(),
    doc="Grouped-map Pandas UDF (applyInPandas): per-source length "
    "normalization computed WHOLE-GROUP in pandas — the grouped-map "
    "execution path (one Arrow batch per group, unlike mapInPandas's "
    "partition batches). The deviance n*cnt-total is an exact integer, "
    "so the kernel's output diffs bit-exactly against a pure window-SQL "
    "oracle. At scale groups shuffle to executors whole: keep group "
    "cardinality >> executor count and group size << executor memory.",
)
def q_udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")

    def kernel(pdf):
        import pandas as pd

        cnt = len(pdf)
        total = int(pdf["n_chars"].sum())
        dev = pdf["n_chars"].astype("int64") * cnt - total
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "source": pdf["source"],
                "dev_n": dev,
            }
        ).sort_values(["dev_n", "doc_id"], kind="mergesort")
        out["rk"] = range(1, cnt + 1)
        return out

    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    return d.groupBy("source").applyInPandas(
        kernel, "doc_id long, source string, dev_n long, rk int"
    )


@register(
    "udf-embed-quantize-int8",
    """
WITH d AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         greatest(list_max(list_transform(e, x -> abs(x))), 0.000000001)
           AS ma
  FROM d
),
q AS (
  SELECT vec_id, ma,
         list_transform(e, x -> CAST(round(x * 127.0 / ma) AS BIGINT)) AS qi
  FROM s
)
SELECT vec_id, round(127.0 / ma, 6) AS scale,
       md5(array_to_string(list_transform(qi, x -> CAST(x AS STRING)), ','))
         AS qfp
FROM q
""".strip(),
    doc="Symmetric int8 quantization of the embedding column (the 4x "
    "storage/bandwidth cut every large-scale ANN index takes): per-vector "
    "scale = 127/max|x|, elements rounded to int8. The quantized vector "
    "is fingerprinted (md5 of the int list) so the oracle verifies every "
    "ELEMENT of every vector, not just the scale. Pure higher-order "
    "array expressions, JVM-side, no shuffle; |x| <= max|x| means no "
    "clamping branch is needed.",
)
def q_udf_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    s = d.select(
        "vec_id",
        "e",
        F.greatest(
            F.array_max(F.transform("e", F.abs)), F.lit(1e-9)
        ).alias("ma"),
    )
    q = s.select(
        "vec_id",
        "ma",
        F.transform(
            "e", lambda x: F.round(x * 127.0 / F.col("ma")).cast("long")
        ).alias("qi"),
    )
    return q.select(
        "vec_id",
        F.round(F.lit(127.0) / F.col("ma"), 6).alias("scale"),
        F.md5(
            F.concat_ws(",", F.transform("qi", lambda x: x.cast("string")))
        ).alias("qfp"),
    )


@register(
    "filter-contamination-ngram",
    """
WITH eval_docs AS (
  SELECT doc_id AS eval_id, substring(text, 1, 120) AS text
  FROM documents WHERE doc_id % 25 = 0
),
eval_sh AS (
  SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS shingle
  FROM (SELECT string_split(text, ' ') AS w FROM eval_docs),
       unnest(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
),
doc_sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM doc_sh JOIN eval_sh USING (shingle)
GROUP BY doc_id HAVING count(*) >= 3
""".strip(),
    doc="Benchmark-contamination detection (the pre-training hygiene check "
    "run before any eval is trusted): an 'eval set' — here the 120-char "
    "prefixes of every 25th doc, standing in for leaked benchmark "
    "questions — is shingled into word 5-grams and every training doc "
    "sharing >= 3 distinct 5-grams with it is flagged with its overlap "
    "count. Scale: the eval shingle set is tiny and broadcast, so the "
    "check is a narrow map-side semi-join over the corpus shingles — no "
    "wide shuffle touches the 100 TB side; distinct-per-doc shingles "
    "bound the count at the doc's shingle cardinality.",
)
def q_filter_contamination_ngram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ai_knowledge_etl_spark.operators import dedup

    d = _docs(spark, sf_dir)
    eval_docs = d.where(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.substring("text", 1, 120).alias("text"),
    )
    eval_sh = (
        dedup.shingles(eval_docs, "eval_id", "text", n=5)
        .select("shingle")
        .distinct()
    )
    doc_sh = dedup.shingles(d, "doc_id", "text", n=5)
    return (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )


@register(
    "sample-domain-reweight",
    """
WITH cnts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_src
  FROM cnts
),
thr AS (
  SELECT source, n_docs,
         least(4294967296 * total // (n_src * n_docs), 4294967296) AS t_int
  FROM cnts, tot
)
SELECT d.source, max(t.n_docs) AS n_docs,
       CAST(max(t.t_int) AS BIGINT) AS t_int,
       CAST(count(*) AS BIGINT) AS n_sampled
FROM documents d JOIN thr t USING (source)
WHERE lpad(substring(md5(CAST(d.doc_id AS STRING)), 1, 8), 9, '0')
      < printf('%09x', t.t_int)
GROUP BY d.source
""".strip(),
    doc="Domain reweighting toward a uniform source mixture (the 'data "
    "mixture' knob of corpus curation): per-source sampling rate = "
    "target/actual share, applied as a DETERMINISTIC md5-keyed filter so "
    "both engines — and any two cluster runs — select the identical row "
    "set. The rate threshold is derived in pure 64-bit integer arithmetic "
    "(floor(2^32 * total / (n_src * n_docs))) and compared in hex-string "
    "space; no float division anywhere, so there is no ulp edge for the "
    "two engines to disagree on. Scale: thresholds are a tiny broadcast "
    "dim; the sample itself is a narrow filter, no shuffle of the corpus.",
)
def q_sample_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    cnts = d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    tot = cnts.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_src"),
    )
    thr = cnts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.least(
            F.expr("4294967296 * total div (n_src * n_docs)"),
            F.lit(4294967296),
        ).alias("t_int"),
    )
    tag = F.lpad(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 9, "0")
    return (
        d.select("doc_id", "source", tag.alias("tag"))
        .join(F.broadcast(thr), "source")
        .where(F.col("tag") < F.format_string("%09x", F.col("t_int")))
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("t_int").cast("long").alias("t_int"),
            F.count("*").cast("long").alias("n_sampled"),
        )
    )


@register(
    "sample-temperature-mixture",
    """
WITH cnts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM cnts),
wts AS (
  SELECT lang, n_docs, pow(CAST(n_docs AS DOUBLE) / tot.total, 0.3) AS w
  FROM cnts, tot
),
wsum AS (SELECT sum(w) AS ws FROM wts),
thr AS (
  SELECT lang, n_docs,
         CAST(round(1048576 * least(1.0, 300.0 * w / (wsum.ws * n_docs)))
              AS BIGINT) AS t_int
  FROM wts, wsum
)
SELECT d.lang, max(t.n_docs) AS n_docs,
       CAST(max(t.t_int) AS BIGINT) AS t_int,
       CAST(count(*) AS BIGINT) AS n_sampled
FROM documents d JOIN thr t USING (lang)
WHERE lpad(substring(md5('ts:' || CAST(d.doc_id AS STRING)), 1, 5), 6, '0')
      < printf('%06x', t.t_int)
GROUP BY d.lang
""".strip(),
    doc="Exponent-smoothed (temperature) language mixture — the "
    "multilingual-pretraining convention q_l ∝ p_l^0.3 (published as the "
    "mBERT/XLM-R sampling rule): high-resource languages are downsampled "
    "toward a flatter mixture under a fixed doc budget (300). Per-lang "
    "keep-rate becomes a 2^20-scaled integer threshold compared against "
    "an md5 prefix in hex-string space — the same deterministic-sampling "
    "discipline as sample-domain-reweight, so both engines (and any two "
    "cluster runs) select the identical row set. The pow() is the one "
    "float step; its result is rounded to integer millionths before any "
    "comparison. The 5-char tag is lpadded to 6 and the threshold "
    "formatted %06x (one char wider than the tag's value range) so a "
    "saturated keep-rate of 1.0 (t_int = 2^20 -> '100000') keeps exactly "
    "100% of docs — a bare %05x would emit a 6-char string that "
    "lexicographically excludes every tag above '10000' (~6% kept). "
    "Rare low-count languages are precisely where the least(1.0,...) cap "
    "fires, so the saturated branch is load-bearing in production.",
)
def q_sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    cnts = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    tot = cnts.agg(F.sum("n_docs").cast("long").alias("total"))
    wts = cnts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.pow(F.col("n_docs").cast("double") / F.col("total"), 0.3).alias("w"),
    )
    wsum = wts.agg(F.sum("w").alias("ws"))
    thr = wts.crossJoin(F.broadcast(wsum)).select(
        "lang",
        "n_docs",
        F.round(
            1048576
            * F.least(
                F.lit(1.0),
                300.0 * F.col("w") / (F.col("ws") * F.col("n_docs")),
            )
        )
        .cast("long")
        .alias("t_int"),
    )
    # lpad the 5-hex-char tag to 6 and format the threshold %06x so the
    # saturated t_int = 2^20 ('100000') admits every '0'-prefixed tag —
    # see the oracle docstring for the %05x failure mode this avoids.
    tag = F.lpad(
        F.substring(
            F.md5(F.concat(F.lit("ts:"), F.col("doc_id").cast("string"))), 1, 5
        ),
        6,
        "0",
    )
    return (
        d.select("doc_id", "lang", tag.alias("tag"))
        .join(F.broadcast(thr), "lang")
        .where(F.col("tag") < F.format_string("%06x", F.col("t_int")))
        .groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("t_int").cast("long").alias("t_int"),
            F.count("*").cast("long").alias("n_sampled"),
        )
    )


@register(
    "agg-vocab-topk",
    """
WITH counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
top AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 1000)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rk,
       token, cnt
FROM top
""".strip(),
    doc="Vocabulary construction: global token counts, top-1000 by "
    "(count desc, token asc — a total order, so the cut line is "
    "deterministic), with final rank. Scale: the count is a map-side-"
    "combining hash agg (vocab cardinality, not corpus size, crosses the "
    "wire); the top-k is TakeOrderedAndProject (per-partition heaps, no "
    "global sort of the vocab); only the 1000 survivors enter the "
    "single-partition rank window.",
)
def q_agg_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    counts = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(1000)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rk"), "token", "cnt"
    )


@register(
    "udf-pandas-agg-median",
    """
SELECT source,
       CAST(max(CASE WHEN rn = (cnt + 1) // 2 THEN n_chars END) AS BIGINT)
         AS med_chars
FROM (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY source) AS cnt
  FROM documents
)
GROUP BY source
""".strip(),
    doc="Grouped-AGGREGATE pandas UDF (the third Arrow execution path "
    "after mapInPandas and grouped-map applyInPandas): an exact lower "
    "median per source computed as a custom vectorized aggregate — one "
    "Arrow column per group in, one scalar out, usable inside a normal "
    ".agg() alongside built-ins. Values are integers and the rank pick "
    "is deterministic, so it diffs bit-exactly against a window-rank "
    "oracle. Scale: same shuffle as any hash agg on the group key; the "
    "kernel sees only its group's column, so memory is bounded by group "
    "size — at pathological groups pre-aggregate or switch to "
    "approx_percentile.",
)
def q_udf_pandas_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)

    def _lower_median(v):
        s = v.sort_values(kind="mergesort").reset_index(drop=True)
        return int(s.iloc[(len(s) - 1) // 2])

    # set real type objects: `from __future__ import annotations` turns
    # inline hints into strings, which pandas_udf cannot resolve
    _lower_median.__annotations__ = {"v": pd.Series, "return": int}
    lower_median = pandas_udf(_lower_median, "long")

    d = _docs(spark, sf_dir).select("source", "n_chars")
    return d.groupBy("source").agg(
        lower_median("n_chars").alias("med_chars")
    )


@register(
    "udf-pandas-scalar-vowels",
    """
SELECT doc_id,
       CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
         AS BIGINT) AS n_vowels,
       CAST(length(text) AS BIGINT) AS n_chars2
FROM documents
""".strip(),
    doc="Scalar (series-to-series) pandas UDF — the vectorized projection "
    "path, distinct from mapInPandas (partition iterator), grouped-map, "
    "and grouped-agg, all four Arrow paths now covered: vowel counts "
    "computed by pandas' vectorized str.count against a pure-SQL "
    "regex-strip oracle, bit-exact integers. Scale: Arrow batches "
    "amortize serialization, but the JVM regex form in the oracle is "
    "what production should run (whole-stage codegen, no Python at "
    "all) — this query exists to pin the API surface, and the oracle "
    "IS the faster plan.",
)
def q_udf_pandas_scalar_vowels(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)

    def _vowels(s):
        return s.str.count("[aeiou]").astype("int64")

    _vowels.__annotations__ = {"s": pd.Series, "return": pd.Series}
    vowels = pandas_udf(_vowels, "long")

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        vowels("text").alias("n_vowels"),
        F.length("text").cast("long").alias("n_chars2"),
    )


# --- BPE vocabulary construction -------------------------------------------------

# Symbol strings: each word becomes its space-separated characters, with
# word frequency carried alongside so pair counts weight by occurrence.
# Merges operate on the symbol string via global leftmost-non-overlapping
# replace — identical semantics in Spark `replace` and DuckDB `replace`.
_BPE_WORDS_CTE = """
bwords AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) > 1 GROUP BY w
),
syms0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(list_transform(generate_series(1, length(w)),
         i -> substring(w, i, 1)), ' ') || ' ' AS s, wc
  FROM bwords
)
""".strip()


def _bpe_pairs_sql(sym_cte: str) -> str:
    """Pair counts over a symbol-string CTE: adjacent symbol bigrams of the
    space-separated symbol list, weighted by word count."""
    return f"""
  SELECT p, CAST(sum(wc) AS BIGINT) AS cnt FROM (
    SELECT list_transform(generate_series(1, len(a) - 1),
                          i -> a[i] || ':' || a[i+1]) AS ps, wc
    FROM (SELECT string_split(trim(s), ' ') AS a, wc FROM {sym_cte})
  ), unnest(ps) AS t(p)
  GROUP BY p
""".strip()


_BPE_ORACLE = f"""
WITH {_BPE_WORDS_CTE},
pc1 AS MATERIALIZED ({_bpe_pairs_sql("syms0")}),
top1 AS (SELECT p, cnt FROM pc1 ORDER BY cnt DESC, p ASC LIMIT 1),
syms1 AS MATERIALIZED (
  SELECT replace(replace(replace(s, ' ', '  '),
                 ' ' || replace(t.p, ':', '  ') || ' ',
                 ' ' || replace(t.p, ':', '') || ' '), '  ', ' ') AS s, wc
  FROM syms0, top1 t
),
pc2 AS MATERIALIZED ({_bpe_pairs_sql("syms1")}),
top2 AS (SELECT p, cnt FROM pc2 ORDER BY cnt DESC, p ASC LIMIT 1),
syms2 AS MATERIALIZED (
  SELECT replace(replace(replace(s, ' ', '  '),
                 ' ' || replace(t.p, ':', '  ') || ' ',
                 ' ' || replace(t.p, ':', '') || ' '), '  ', ' ') AS s, wc
  FROM syms1, top2 t
),
pc3 AS MATERIALIZED ({_bpe_pairs_sql("syms2")}),
top3 AS (SELECT p, cnt FROM pc3 ORDER BY cnt DESC, p ASC LIMIT 1)
SELECT 1 AS round, p AS pair, cnt FROM top1
UNION ALL SELECT 2, p, cnt FROM top2
UNION ALL SELECT 3, p, cnt FROM top3
""".strip()


@register(
    "agg-bpe-merges",
    _BPE_ORACLE,
    doc="BPE vocabulary construction (Sennrich et al. 2016, public) — the "
    "first three merge rounds of byte-pair encoding over the corpus word "
    "frequencies: words become space-separated symbol strings, adjacent "
    "symbol pairs are counted weighted by word frequency, the argmax "
    "pair (count desc, pair asc tiebreak) is merged via global "
    "leftmost-non-overlapping replace, and the cycle repeats. Each "
    "round is a hash aggregate over an exploded pair stream plus a "
    "1-row broadcast of the chosen merge — the canonical tokenizer-"
    "training loop expressed as chained lazy stages (rounds beyond 3 "
    "continue the same pattern with a driver loop + localCheckpoint, "
    "the connected-components discipline). Scale: the word-frequency "
    "table is vocabulary-sized (not corpus-sized) after the first "
    "aggregate, so every merge round runs on |vocab| rows regardless "
    "of corpus size — this is why production BPE trainers count words "
    "first, and this plan does the same.",
)
def q_agg_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint: each merge round's argmax is a separate subtree of
    # one lazy plan, so without the cut every round re-runs the
    # corpus-sized tokenize explode (measured 595 s at the 100x sweep).
    # The checkpointed frame is VOCABULARY-sized — tiny at any corpus.
    words = eager_cut(
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
        )
        .where(F.length("w") > 1)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wc"))
    )
    syms = words.select(
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr(
                    "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
                ),
                " ",
            ),
            F.lit(" "),
        ).alias("s"),
        "wc",
    )

    # shared split-once pair counter (operators/bpe.pair_counts): the old
    # inline copy re-split the symbol string at every element_at inside
    # the transform lambda — same values, O(len) fewer re-splits per pair
    from ai_knowledge_etl_spark.operators.bpe import pair_counts

    def top_pair(pc: DataFrame) -> DataFrame:
        return pc.orderBy(F.desc("cnt"), F.asc("p")).limit(1)

    def apply_merge(sym_df: DataFrame, top: DataFrame) -> DataFrame:
        return sym_df.crossJoin(F.broadcast(top.select("p"))).select(
            F.expr(
                # expand-replace-collapse: doubling the delimiters lets two
                # ADJACENT pair occurrences (shared space) both merge in
                # one pass — classic BPE run-merge semantics, identical
                # replace scan in both engines (operators/bpe.py)
                "replace(replace(replace(s, ' ', '  '),"
                " ' ' || replace(p, ':', '  ') || ' ',"
                " ' ' || replace(p, ':', '') || ' '), '  ', ' ')"
            ).alias("s"),
            "wc",
        )

    rounds = []
    cur = syms
    for rnd in (1, 2, 3):
        top = top_pair(pair_counts(cur))
        rounds.append(
            top.select(
                F.lit(rnd).alias("round"), F.col("p").alias("pair"), "cnt"
            )
        )
        if rnd < 3:
            cur = apply_merge(cur, top)
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


_BPE_TOKENIZE_ORACLE = f"""
WITH bwords AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) > 1 GROUP BY w
),
s0 AS MATERIALIZED (
  SELECT w, ' ' || array_to_string(list_transform(generate_series(1, length(w)),
         i -> substring(w, i, 1)), ' ') || ' ' AS s, wc
  FROM bwords
),
pc1 AS MATERIALIZED ({_bpe_pairs_sql("s0")}),
top1 AS (SELECT p FROM pc1 ORDER BY cnt DESC, p ASC LIMIT 1),
s1 AS MATERIALIZED (
  SELECT w, replace(replace(replace(s, ' ', '  '),
                 ' ' || replace(t.p, ':', '  ') || ' ',
                 ' ' || replace(t.p, ':', '') || ' '), '  ', ' ') AS s, wc
  FROM s0, top1 t
),
pc2 AS MATERIALIZED ({_bpe_pairs_sql("s1")}),
top2 AS (SELECT p FROM pc2 ORDER BY cnt DESC, p ASC LIMIT 1),
s2 AS MATERIALIZED (
  SELECT w, replace(replace(replace(s, ' ', '  '),
                 ' ' || replace(t.p, ':', '  ') || ' ',
                 ' ' || replace(t.p, ':', '') || ' '), '  ', ' ') AS s, wc
  FROM s1, top2 t
),
pc3 AS MATERIALIZED ({_bpe_pairs_sql("s2")}),
top3 AS (SELECT p FROM pc3 ORDER BY cnt DESC, p ASC LIMIT 1),
s3 AS MATERIALIZED (
  SELECT w, replace(replace(replace(s, ' ', '  '),
                 ' ' || replace(t.p, ':', '  ') || ' ',
                 ' ' || replace(t.p, ':', '') || ' '), '  ', ' ') AS s, wc
  FROM s2, top3 t
),
vocab AS MATERIALIZED (
  SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_sym FROM s3
)
SELECT d.doc_id,
       CAST(sum(v.n_sym) AS BIGINT) AS n_bpe_tokens,
       CAST(count(*) AS BIGINT) AS n_words,
       md5(string_agg(CAST(v.n_sym AS STRING), ',' ORDER BY d.pos)) AS seq_fp
FROM (
  SELECT doc_id, i AS pos, ws[i] AS w FROM (
    SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS ws
    FROM documents
  ), unnest(generate_series(1, len(ws))) t(i)
  WHERE length(ws[i]) > 1
) d JOIN vocab v USING (w)
GROUP BY d.doc_id
""".strip()


@register(
    "udf-bpe-tokenize",
    _BPE_TOKENIZE_ORACLE,
    doc="BPE tokenizer APPLICATION (the consumer of agg-bpe-merges): the "
    "three learned merges are applied to the word vocabulary, giving a "
    "word -> symbol-count table; each document then reports its total "
    "BPE token count, word count, and an md5 fingerprint of the "
    "per-position symbol-count sequence — so the oracle verifies the "
    "tokenization of EVERY word occurrence in order, not just totals. "
    "Scale: merges train and apply on the VOCABULARY (|vocab| rows, "
    "corpus-size-independent — the reason production BPE trainers count "
    "words first); the corpus-sized work is one explode + one broadcast "
    "join of the vocab table + one ordered-collect per doc.",
)
def q_udf_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # vocabulary-sized checkpoint — see q_agg_bpe_merges
    words = eager_cut(
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
        )
        .where(F.length("w") > 1)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wc"))
    )
    syms = words.select(
        "w",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr(
                    "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
                ),
                " ",
            ),
            F.lit(" "),
        ).alias("s"),
        "wc",
    )

    # shared split-once pair counter — see q_agg_bpe_merges
    from ai_knowledge_etl_spark.operators.bpe import pair_counts

    cur = syms
    for _ in range(3):
        top = pair_counts(cur).orderBy(F.desc("cnt"), F.asc("p")).limit(1)
        cur = cur.crossJoin(F.broadcast(top.select("p"))).select(
            "w",
            F.expr(
                # expand-replace-collapse: doubling the delimiters lets two
                # ADJACENT pair occurrences (shared space) both merge in
                # one pass — classic BPE run-merge semantics, identical
                # replace scan in both engines (operators/bpe.py)
                "replace(replace(replace(s, ' ', '  '),"
                " ' ' || replace(p, ':', '  ') || ' ',"
                " ' ' || replace(p, ':', '') || ' '), '  ', ' ')"
            ).alias("s"),
            "wc",
        )
    vocab = cur.select(
        "w", F.size(F.split(F.trim("s"), " ")).cast("long").alias("n_sym")
    )
    stream = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), "[^a-z]+")).alias("pos0", "w"),
    ).where(F.length("w") > 1)
    return (
        stream.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
            F.count("*").cast("long").alias("n_words"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos0", "n_sym"))
                        ),
                        lambda x: x.getField("n_sym").cast("string"),
                    ),
                    ",",
                )
            ).alias("seq_fp"),
        )
    )


# --- end-to-end training-set pipeline -------------------------------------------

# PII tail synth shared with udf-redact-pii (doc_id-parameterized so clone
# rows get distinct tails); dialect-common.
_PII_TAIL_SQL = (
    "' Contact user' || CAST(doc_id AS STRING)"
    " || '@mail.example.com or call +1 555-01'"
    " || CAST(doc_id % 90 + 10 AS STRING)"
    " || CASE WHEN doc_id % 5 = 0"
    "      THEN ' today. Card 4111111111111111.' ELSE ' today.' END"
)

_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(text,"
    " '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),"
    " '\\b[0-9]{13,16}\\b', '<CARD>', 'g'),"
    " '\\+?[0-9][0-9 ()\\-]{6,}[0-9]', '<PHONE>', 'g')"
)

_TRAINING_SET_ORACLE = f"""
WITH RECURSIVE
corpus0 AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, source,
         text || ' near duplicate tail marker' AS text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, source, text
  FROM documents WHERE doc_id % 25 = 0
),
corpus AS (
  SELECT doc_id, source, text || {_PII_TAIL_SQL} AS text FROM corpus0
),
clean AS MATERIALIZED (
  SELECT doc_id, source, {_REDACT_SQL} AS text
  FROM corpus WHERE text IS NOT NULL AND length(text) >= 120
),
fps AS MATERIALIZED (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM clean
),
exact_edges AS (
  SELECT a, b FROM (
    SELECT min(doc_id) OVER (PARTITION BY fp) AS a, doc_id AS b FROM fps
  ) WHERE a <> b
),
reps AS MATERIALIZED (SELECT min(doc_id) AS doc_id FROM fps GROUP BY fp),
shr AS MATERIALIZED (
  SELECT DISTINCT c.doc_id, c.source,
         array_to_string(words[i:i+2], ' ') AS shingle
  FROM (
    SELECT cl.doc_id, cl.source, string_split(cl.text, ' ') AS words,
           unnest(generate_series(1,
             greatest(len(string_split(cl.text, ' ')) - 2, 1))) AS i
    FROM clean cl JOIN reps USING (doc_id)
  ) c
),
shc AS MATERIALIZED (
  SELECT shr.doc_id, shr.source, shr.shingle FROM shr
  JOIN (
    SELECT source, shingle FROM shr GROUP BY source, shingle
    HAVING count(*) <= 100
  ) ok USING (source, shingle)
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
           FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM shc a JOIN shc b
    ON a.shingle = b.shingle AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac_edges AS (
  SELECT doc_a AS a, doc_b AS b FROM inter
  JOIN counts ca ON doc_a = ca.doc_id
  JOIN counts cb ON doc_b = cb.doc_id
  WHERE inter / CAST(ca.n_sh + cb.n_sh - inter AS DOUBLE) >= 0.6
),
edges0 AS (SELECT a, b FROM exact_edges UNION SELECT a, b FROM jac_edges),
edges AS (SELECT a, b FROM edges0 UNION SELECT b AS a, a AS b FROM edges0),
reach(node, lab) AS (
  SELECT a AS node, a AS lab FROM edges
  UNION
  SELECT e.b AS node, r.lab FROM reach r JOIN edges e ON e.a = r.node
),
labs AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
),
dropn AS (SELECT doc_id FROM labs WHERE doc_id <> cluster_id),
kept AS MATERIALIZED (
  SELECT c.* FROM clean c LEFT JOIN dropn d USING (doc_id)
  WHERE d.doc_id IS NULL
),
split AS (
  SELECT doc_id, source, text,
         CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < 'cc'
                THEN 'train'
              WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < 'e6'
                THEN 'val'
              ELSE 'test' END AS split
  FROM kept
),
toks AS (
  SELECT doc_id, source, split,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         md5(text) AS red_fp
  FROM split
),
packed AS (
  SELECT doc_id, source, split, n_tok, red_fp,
         CAST(coalesce(sum(n_tok) OVER (
           PARTITION BY split, source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM toks
)
SELECT doc_id, source, split, n_tok, cum_prev,
       CAST(cum_prev // 512 AS BIGINT) AS first_window,
       CAST((cum_prev + n_tok - 1) // 512 AS BIGINT) AS last_window,
       CAST((cum_prev + n_tok - 1) // 512 - cum_prev // 512 + 1 AS BIGINT)
         AS n_windows,
       red_fp
FROM packed
""".strip()


@register(
    "pipeline-training-set",
    _TRAINING_SET_ORACLE,
    doc="The downstream training-set pipeline END-TO-END as one lazy plan "
    "(pipeline.prepare_training_set): quarantine (length gate) → PII "
    "redaction (email/card/phone placeholder chain, fingerprinted in the "
    "output so every redacted byte is verified) → exact-first transitive "
    "near-dup clustering (fingerprint star edges + df-capped Jaccard "
    "edges between exact-group representatives → connected components, "
    "keep canonicals) → deterministic md5 train/val/test split → "
    "per-(split,source)-stream concat-and-chunk packing into 512-token "
    "windows (streams keyed by split alone would sort 1/3 of the corpus "
    "in one window partition — the mad-outliers lesson). The "
    "oracle composes each stage's proven CTE, with the iterative CC "
    "loop replayed by WITH RECURSIVE closure. The dup-injected corpus "
    "(+10M near / +20M exact clones) plus per-row PII tails give every "
    "stage true positives. Registered on the md5-string shingle path; "
    "production keeps the xxhash64 shingle keys "
    "(use_hashed_shingles=True, identical absent 1e-8 collisions).",
)
def q_pipeline_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark import pipeline as P
    from ai_knowledge_etl_spark.registry.northstar import _dup_corpus

    corpus = _dup_corpus(spark, sf_dir).select(
        "doc_id",
        "source",
        F.expr(f"text || {_PII_TAIL_SQL}").alias("text"),
    )
    out = P.prepare_training_set(
        corpus, min_chars=120, use_hashed_shingles=False
    )
    return out.select(
        "doc_id",
        "source",
        "split",
        "n_tok",
        "cum_prev",
        "first_window",
        "last_window",
        "n_windows",
        F.md5("text").alias("red_fp"),
    )


# --- N-round BPE training + tokenize + pack (round-3 verdict #4) ----------------

_BPE_N_ROUNDS = 8


def _bpe_chain_sql(n_rounds: int) -> str:
    """Chained-CTE replay of the N-round driver loop: tp{r} pair counts,
    tt{r} argmax merge, t{r} merged symbols — AS MATERIALIZED at every
    stage seam (DuckDB CTE inlining is exponential in reference count)."""
    parts = [
        """tw AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) > 1 GROUP BY w
),
t0 AS MATERIALIZED (
  SELECT w, ' ' || array_to_string(list_transform(generate_series(1, length(w)),
         i -> substring(w, i, 1)), ' ') || ' ' AS s, wc
  FROM tw
)"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(
            f"""tp{r} AS MATERIALIZED ({_bpe_pairs_sql(f"t{r - 1}")}),
tt{r} AS (SELECT p, cnt FROM tp{r} ORDER BY cnt DESC, p ASC LIMIT 1),
t{r} AS MATERIALIZED (
  SELECT w, replace(replace(replace(s, ' ', '  '),
                 ' ' || replace(t.p, ':', '  ') || ' ',
                 ' ' || replace(t.p, ':', '') || ' '), '  ', ' ') AS s, wc
  FROM t{r - 1}, tt{r} t
)"""
        )
    return ",\n".join(parts)


_BPE_MERGES_N_ORACLE = (
    f"WITH {_bpe_chain_sql(_BPE_N_ROUNDS)}\n"
    + "\nUNION ALL\n".join(
        f"SELECT {r} AS round, p AS pair, cnt FROM tt{r}"
        for r in range(1, _BPE_N_ROUNDS + 1)
    )
)


@register(
    "agg-bpe-merges-n",
    _BPE_MERGES_N_ORACLE,
    doc=f"BPE vocabulary construction generalized to {_BPE_N_ROUNDS} merge "
    "rounds via the driver-loop discipline (operators/bpe.train_merges): "
    "per round, pair counts on the vocabulary-sized word table, a 1-row "
    "bounded argmax collect (loop control, the CC-iteration exception to "
    "the no-driver-collect rule), and a LITERAL leftmost replace — no "
    "join once the pair is known. localCheckpoint every 4 rounds stops "
    "the lazy plan growing an N-projection tail. The DuckDB twin replays "
    "all rounds as chained MATERIALIZED CTEs, so every round's argmax is "
    "differentially pinned, not just the final vocabulary.",
)
def q_agg_bpe_merges_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = bpe.train_merges(
        bpe.to_symbols(bpe.word_counts(docs)), _BPE_N_ROUNDS
    )
    return spark.createDataFrame(
        merges, "round int, pair string, cnt long"
    )


_TOKENIZE_PACK_ORACLE = f"""
WITH {_bpe_chain_sql(_BPE_N_ROUNDS)},
tv AS MATERIALIZED (
  SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_sym
  FROM t{_BPE_N_ROUNDS}
),
tok AS MATERIALIZED (
  SELECT d.doc_id, d.source,
         CAST(sum(v.n_sym) AS BIGINT) AS n_bpe_tokens,
         CAST(count(*) AS BIGINT) AS n_words
  FROM (
    SELECT doc_id, source,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) d JOIN tv v USING (w)
  GROUP BY d.doc_id, d.source
)
SELECT doc_id, source, n_bpe_tokens, n_words, cum_prev,
       CAST(cum_prev // 512 AS BIGINT) AS first_window,
       CAST((cum_prev + n_bpe_tokens - 1) // 512 AS BIGINT) AS last_window,
       CAST((cum_prev + n_bpe_tokens - 1) // 512 - cum_prev // 512 + 1
            AS BIGINT) AS n_windows
FROM (
  SELECT doc_id, source, n_bpe_tokens, n_words,
         CAST(coalesce(sum(n_bpe_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM tok
)
""".strip()


@register(
    "pipeline-tokenize-pack",
    _TOKENIZE_PACK_ORACLE,
    doc="Tokenizer-to-training-windows pipeline — the last seam in the "
    f"training-data path: train a {_BPE_N_ROUNDS}-merge BPE vocabulary "
    "(operators/bpe driver loop, vocabulary-sized rounds), APPLY it to "
    "every word occurrence (one corpus explode + one broadcast join of "
    "the learned vocab), then PACK the per-doc BPE token counts into "
    "512-token context windows per source stream (exclusive cumsum, "
    "operators/packing). One composed oracle replays train+tokenize+pack "
    "end-to-end, so a drift anywhere in the chain — a wrong merge, a "
    "miscounted token, a shifted window boundary — breaks the hash. "
    "Scale: merge rounds are corpus-size-independent; the pack cumsum is "
    "per-(source) stream, no global ordering.",
)
def q_pipeline_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_etl_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    words = bpe.word_counts(docs)
    _, final = bpe.train_merges(bpe.to_symbols(words), _BPE_N_ROUNDS)
    vocab = bpe.vocab_symbol_counts(final)
    tok = bpe.tokenize_counts(docs, vocab, keep=("source",))
    return packing.concat_chunk_pack(
        tok,
        order_col="doc_id",
        tok_col="n_bpe_tokens",
        budget=512,
        partition_col="source",
    ).select(
        "doc_id",
        "source",
        "n_bpe_tokens",
        "n_words",
        "cum_prev",
        "first_window",
        "last_window",
        "n_windows",
    )


@register(
    "sample-mixture-epochs",
    """
WITH eps AS (
  SELECT doc_id, source,
         CASE CAST(substring(source, 4) AS INTEGER) % 5
           WHEN 0 THEN 3000000 WHEN 1 THEN 1500000 WHEN 2 THEN 1000000
           WHEN 3 THEN 400000 ELSE 250000 END AS ep_ppm
  FROM documents
),
cop AS (
  SELECT doc_id, source, ep_ppm,
         ep_ppm // 1000000
         + CASE WHEN lpad(substring(md5('em:' || CAST(doc_id AS STRING)), 1, 5), 6, '0')
                     < printf('%06x', (CAST(1048576 AS BIGINT) * (ep_ppm % 1000000)) // 1000000)
                THEN 1 ELSE 0 END AS n_copies
  FROM eps
),
reps AS (
  SELECT doc_id, source, ep_ppm,
         unnest(generate_series(1, CAST(n_copies AS INTEGER))) AS copy
  FROM cop WHERE n_copies >= 1
)
SELECT source,
       CAST(max(ep_ppm) AS BIGINT) AS ep_ppm,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(copy * doc_id) AS BIGINT) AS copy_fp
FROM reps GROUP BY source
""".strip(),
    doc="Multi-epoch data-recipe materialization (the published "
    "LLaMA/GPT-3-style mixture table: curated sources repeat >1 epoch, "
    "bulk web <1): per-source epoch targets in integer ppm (3.0x, 1.5x, "
    "1.0x, 0.4x, 0.25x by source class) expand to floor(ep) full copies "
    "of every doc via an explode over sequence(1, n) — an empty array "
    "for the 0-copy case, never sequence(1,0), which Spark would "
    "auto-step DOWNWARD into [1,0] — plus one extra copy for docs whose "
    "md5 tag clears the fractional remainder converted to a 2^20-scaled "
    "hex threshold in pure integer arithmetic (the "
    "sample-temperature-mixture discipline; both engines and any two "
    "cluster runs materialize the identical multiset). Unlike the "
    "reweighting ops, which only compute KEEP RATES, this emits the "
    "actual training multiset with a copy index — the input "
    "pack-sequences consumes; copy_fp pins the exact (doc, copy) "
    "assignment. Scale: narrow map + explode, fan-out bounded by "
    "max-epochs, no shuffle before the final stats aggregate.",
)
def q_sample_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    ep = (
        F.when(F.substring("source", 4, 10).cast("int") % 5 == 0, 3000000)
        .when(F.substring("source", 4, 10).cast("int") % 5 == 1, 1500000)
        .when(F.substring("source", 4, 10).cast("int") % 5 == 2, 1000000)
        .when(F.substring("source", 4, 10).cast("int") % 5 == 3, 400000)
        .otherwise(250000)
    )
    thr = F.format_string(
        "%06x",
        F.expr(
            "(CAST(1048576 AS BIGINT) * (ep_ppm % 1000000)) div 1000000"
        ).cast("long"),
    )
    tag = F.lpad(
        F.substring(F.md5(F.concat(F.lit("em:"), F.col("doc_id").cast("string"))), 1, 5),
        6,
        "0",
    )
    cop = docs.withColumn("ep_ppm", ep).withColumn(
        "n_copies",
        F.expr("ep_ppm div 1000000").cast("long")
        + F.when(tag < thr, 1).otherwise(0),
    )
    reps = cop.select(
        "doc_id",
        "source",
        "ep_ppm",
        F.explode(
            F.when(
                F.col("n_copies") >= 1,
                F.sequence(F.lit(1), F.col("n_copies").cast("int")),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("copy"),
    )
    return reps.groupBy("source").agg(
        F.max("ep_ppm").cast("long").alias("ep_ppm"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("copy") * F.col("doc_id")).cast("long").alias("copy_fp"),
    )
