"""Capped unigram language model: the bounded-artifact form of the
CCNet-style LM quality score (Wenzek et al. 2020, public).

Why capped: the naive plan broadcasts the corpus's full raw token
vocabulary back onto the token stream. That is fine for a pretrained LM
artifact (whose vocab is capped by construction) but wrong for a raw web
corpus — by Heaps' law a 100 TB crawl has billions of distinct raw tokens
(typos, URLs, hex ids), which no driver can build into a broadcast table.
The shipped-KenLM fix is to cap the vocabulary: keep the top-K tokens by
count (deterministic tiebreak on the token) and fold every remaining
token into ONE out-of-vocabulary bucket that carries the residual mass.
The LM table is then <= K+1 rows at ANY corpus size — a true broadcast.

Spark plan (all JVM-side):
  1. one token hash-agg -> (w, cnt)                 [shuffle on w]
  2. top-K by (cnt desc, w asc) via sort+limit      [TakeOrderedAndProject:
     each task keeps K rows, merge-sorts at the driver — O(types) scan,
     no full vocab shuffle, bounded driver memory]
  3. scalar total + residual mass (two 1-row aggs)
  4. tokens LEFT-join BROADCAST(top-K); unmatched tokens score the OOV
     floor ln(residual/total); per-doc partial/final avg.

Reference anchor: the fixed-size-artifact-between-stages discipline of
the hierarchical summary budget (config/limits.yaml:143-163); the same
bounded-table idea the repo already uses for DSIR's hashed buckets
(operators/curation.py) and the shipped bigram counts table.

Choosing K (measured, round-6 — tools/bench_lm_cap.py): the registry
default UNIGRAM_VOCAB_TOPK=24 exists so the cap BINDS on the 31-type
fixture and the OOV branch is differentially tested; it is not a
production value. At a production-scale K = 2^15 over a 126,966-type /
27M-token corpus (100x scaled documents, wide-vocab probe), the
TakeOrderedAndProject artifact build and the K+1-row broadcast scoring
pass both complete value-exact against the DuckDB twin (0 mismatches)
and scale SUBLINEARLY: 100x the tokens cost 18x the artifact build and
25x the scoring wall. Driver merge memory is tasks x K rows of (w, cnt)
— at K=2^15 and 32 tasks that is ~1M small rows, far under any driver
heap; pick K by the LM quality you need (CCNet uses full SentencePiece
vocabs ~2^16), not by engine limits, and keep the fixture-binding
property (K < |fixture vocab|) only in differential tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config


def capped_lm_table(
    toks: DataFrame, w_col: str = "w", cap: int = config.UNIGRAM_VOCAB_TOPK
) -> DataFrame:
    """The bounded LM artifact: top-`cap` (w, cnt) rows by count, ties
    broken by token ascending. sort+limit compiles to
    TakeOrderedAndProject — a distributed top-K, not a global sort."""
    vocab = toks.groupBy(w_col).agg(F.count("*").alias("cnt"))
    return vocab.orderBy(F.desc("cnt"), F.asc(w_col)).limit(cap)


def avg_logprob(
    toks: DataFrame,
    doc_col: str = "doc_id",
    w_col: str = "w",
    cap: int = config.UNIGRAM_VOCAB_TOPK,
    decimals: int = 3,
) -> DataFrame:
    """Per-doc average token log-probability under the capped unigram LM.

    Returns (doc_col, n_tokens BIGINT, avg_logprob DOUBLE rounded).
    In-vocab token: ln(cnt / total). OOV token: ln(residual / total)
    where residual = total - sum(top-K counts) — the single OOV bucket's
    mass (floored at 1 so the constant is defined even when the cap does
    not bind; the OOV branch is then never taken per-row).
    """
    # Every constant derives from the (w, cnt) vocabulary aggregate, NOT
    # from a separate toks.count() pass: tot = Σ cnt is the same integer,
    # and with all three constant subplans rooted in the identical vocab
    # aggregate the runtime reuses one physical exchange where the old
    # shape paid a third full token-stream scan just to count it
    # (round-8 A/B at sf0.1: 0.71 → 0.55 s warm). Persisting vocab
    # instead was also measured and LOSES — the cache write costs more
    # than the deduplicated replays.
    vocab = toks.groupBy(w_col).agg(F.count("*").alias("cnt"))
    topk = vocab.orderBy(F.desc("cnt"), F.asc(w_col)).limit(cap)
    consts = (
        vocab.agg(F.sum("cnt").cast("long").alias("tot"))
        .crossJoin(
            F.broadcast(
                topk.agg(F.sum("cnt").cast("long").alias("kmass"))
            )
        )
        .select(
            "tot",
            F.greatest(F.col("tot") - F.col("kmass"), F.lit(1)).alias("om"),
        )
    )
    logp = F.log(
        F.coalesce(F.col("cnt"), F.col("om")).cast("double") / F.col("tot")
    )
    return (
        toks.join(F.broadcast(topk), w_col, "left")
        .crossJoin(F.broadcast(consts))
        .groupBy(doc_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg(logp), decimals).alias("avg_logprob"),
        )
    )


def oracle_lm_ctes(
    toks_rel: str = "toks", cap: int = config.UNIGRAM_VOCAB_TOPK
) -> str:
    """DuckDB CTE fragment computing the SAME capped LM over a relation
    `toks_rel`(doc_id, w): defines vocab/topk/lmc and a scorable
    left-join shape. Callers append their own per-doc aggregate over
    `lmtoks` (doc_id, lp = per-token log-probability)."""
    return f"""
vocab AS (SELECT w, count(*) AS cnt FROM {toks_rel} GROUP BY w),
topk AS (SELECT w, cnt FROM vocab ORDER BY cnt DESC, w ASC LIMIT {cap}),
lmc AS (
  SELECT CAST(count(*) AS BIGINT) AS tot,
         greatest(CAST(count(*) AS BIGINT)
                  - (SELECT CAST(sum(cnt) AS BIGINT) FROM topk), 1) AS om
  FROM {toks_rel}
),
lmtoks AS (
  SELECT t.doc_id,
         ln(CAST(coalesce(k.cnt, c.om) AS DOUBLE) / c.tot) AS lp
  FROM {toks_rel} t LEFT JOIN topk k USING (w), lmc c
)
""".strip()
