"""Hot-shingle document-frequency cap (VERDICT r1 #6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config
from ai_knowledge_etl_spark.operators import dedup


def test_cap_is_noop_on_fixture_corpus(spark, sf_dir):
    """At fixture scale every (source, shingle) df is far under the 100
    cap (measured max 25 at sf0.01), so the capped pipeline must emit
    EXACTLY the uncapped pairs — proving the hygiene step changes no
    results until an actual boilerplate explosion appears."""
    from ai_knowledge_etl_spark.registry import northstar as NS

    sh = NS._shingles(spark, sf_dir)
    capped = dedup.cap_shingle_df(
        sh, "doc_id", config.DEDUP_SHINGLE_MAX_DF, group_col="source"
    )
    assert capped.count() == sh.count()  # nothing dropped
    base = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(sh, "doc_id", "source", 0.6).collect()
    }
    with_cap = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(capped, "doc_id", "source", 0.6).collect()
    }
    assert base == with_cap


def test_cap_drops_boilerplate_and_bounds_fanout(spark):
    """A shingle shared by every doc (the 'MIT license header' case) must
    be dropped, collapsing the blocked self-join's worst key from n² to
    zero while genuinely-shared rare shingles survive."""
    n = 300
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("source"),
        F.concat(
            F.lit("common boilerplate header line "),  # in every doc
            F.lit("unique token "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    sh = dedup.shingles(docs, "doc_id", "text", n=3, keep=("source",))
    capped = dedup.cap_shingle_df(sh, "doc_id", 100, group_col="source")
    hot_left = (
        capped.groupBy("shingle")
        .count()
        .where(F.col("count") > 100)
        .count()
    )
    assert hot_left == 0
    # every surviving shingle has df <= 100, so any equi-key's pair fanout
    # is <= 100 choose 2 — the boilerplate key's n²/2 pairs are gone
    pairs = dedup.jaccard_pairs(capped, "doc_id", "source", threshold=0.01)
    assert pairs.count() < n * (n - 1) / 2
