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


def test_containment_catches_excerpts_jaccard_misses(spark, sf_dir):
    """The injected first-half excerpts (+50M ids) must be flagged by
    containment; symmetric Jaccard at its 0.6 gate structurally cannot
    see them (union dominated by the full doc -> score ~0.5)."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.registry import REGISTRY

    rows = REGISTRY["dedup-containment"].spark(spark, sf_dir).collect()
    probe_pairs = [
        r for r in rows
        if r.doc_b >= 50000000 and r.doc_a == r.doc_b - 50000000
    ]
    assert probe_pairs, "no injected excerpt pair was flagged"
    for r in probe_pairs:
        assert r.cont_ppm >= 800000
        # the Jaccard of the same pair stays under the symmetric gate
        jac = r.inter / (r.n_a + r.n_b - r.inter)
        assert jac < 0.6, (
            f"excerpt pair {r.doc_a}/{r.doc_b} visible to Jaccard "
            f"({jac:.2f}) — probe no longer asymmetric"
        )


def test_simhash_vote_comparison_equals_top_bit_of_every_nibble(spark):
    """r11 optimization pin: the per-bit vote is now `substring >= '8'`
    (one comparison) instead of isin('8'..'f') (eight). Over a corpus
    whose shingle md5s collectively exercise every hex digit in every
    one of the 16 positions, the simhash must equal a reference computed
    from the numeric nibble's top bit."""
    sh = spark.createDataFrame(
        [(i % 7, f"shingle-{i}") for i in range(300)],
        "doc_id long, shingle string",
    )
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash16(sh, "doc_id").collect()
    }
    # reference: numeric nibble >= 8 via conv(), the spec's "top bit set"
    hashed = sh.select("doc_id", F.md5("shingle").alias("h"))
    votes = [
        F.sum(
            F.when(
                F.conv(F.substring("h", i + 1, 1), 16, 10).cast("int") >= 8,
                1,
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(16)
    ]
    bits = F.concat(
        *[
            F.when(F.col(f"v{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(16)
        ]
    )
    ref = {
        r["doc_id"]: r["ref"]
        for r in hashed.groupBy("doc_id")
        .agg(*votes)
        .select("doc_id", bits.alias("ref"))
        .collect()
    }
    assert got == ref
