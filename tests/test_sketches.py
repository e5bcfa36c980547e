"""Sketch-family quality gates — parity proves determinism, these prove the
sketches are actually GOOD: CMS never undercounts and overcounts rarely at
fixture fill; KMV lands within its theoretical relative-error envelope once
the sketch is full; bloom has structurally zero false negatives and a
bounded false-positive rate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import sketches as SK
from ai_knowledge_etl_spark.registry import REGISTRY

SF001 = "/root/testdata/sf0.01"  # 150 distinct users: KMV (k=64) is FULL


def test_cms_never_undercounts_and_rarely_over(spark, sf_dir):
    rows = REGISTRY["agg-countmin-heavyhitters"].spark(spark, sf_dir).collect()
    assert rows, "no heavy hitters returned"
    assert all(r.never_under for r in rows), "CMS undercounted — impossible"
    # 4x1024 grid vs <=1500 keys: collisions are rare; the TOP keys by
    # exact count should estimate exactly (min-over-rows kills single-row
    # collisions). Allow a small overcount tail.
    exact_hits = sum(1 for r in rows if r.est_cnt == r.exact_cnt)
    assert exact_hits >= len(rows) * 0.9, (
        f"CMS overcounted {len(rows) - exact_hits}/{len(rows)} top keys"
    )


def test_cms_grid_is_mergeable(spark, sf_dir):
    """Cell-wise sum of per-half grids == grid of the whole — the property
    that makes day-grain CMS tables compose at 100 TB."""
    from ai_knowledge_etl_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key")
    )
    keyed = ev.groupBy("key").agg(F.count("*").cast("long").alias("cnt"))
    whole = SK.cms_table(keyed, "key", "cnt")
    halves = [
        SK.cms_table(
            ev.where(f"CAST(key AS BIGINT) % 2 = {i}")
            .groupBy("key")
            .agg(F.count("*").cast("long").alias("cnt")),
            "key",
            "cnt",
        )
        for i in (0, 1)
    ]
    merged = (
        halves[0]
        .unionByName(halves[1])
        .groupBy("d", "bucket")
        .agg(F.sum("total").cast("long").alias("total"))
    )
    a = {(r.d, r.bucket): r.total for r in whole.collect()}
    b = {(r.d, r.bucket): r.total for r in merged.collect()}
    assert a == b


@pytest.mark.skipif(
    not os.path.isdir(SF001), reason="sf0.01 fixture not present"
)
def test_kmv_relative_error_when_full(spark):
    rows = REGISTRY["agg-kmv-distinct-setops"].spark(spark, SF001).collect()
    assert rows
    for r in rows:
        for est, exact, what in (
            (r.est_a, r.exact_a, "a"),
            (r.est_b, r.exact_b, "b"),
            (r.est_union, r.exact_union, "union"),
        ):
            # k=64 -> sigma ~ 1/sqrt(62) ~ 12.7%; gate at ~3 sigma
            assert abs(est - exact) <= max(0.4 * exact, 2), (
                f"KMV {what} {r.type_a}/{r.type_b}: est={est} exact={exact}"
            )
        # intersection is the noisiest (j/k scaled): gate loosely but
        # meaningfully — the fixture's type pairs share most users
        assert abs(r.est_inter - r.exact_inter) <= max(
            0.5 * r.exact_inter, 5
        ), (
            f"KMV inter {r.type_a}/{r.type_b}: "
            f"est={r.est_inter} exact={r.exact_inter}"
        )


def test_kmv_exact_when_not_full(spark, sf_dir):
    """sf0.001 has ~15 users per type — below k, a KMV sketch holds the
    whole set and every estimate must be EXACT."""
    rows = REGISTRY["agg-kmv-distinct-setops"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.est_a == r.exact_a and r.est_b == r.exact_b
        assert r.est_union == r.exact_union
        assert r.est_inter == r.exact_inter


def test_bloom_no_false_negatives_bounded_false_positives(spark, sf_dir):
    rows = REGISTRY["dedup-bloom-gate"].spark(spark, sf_dir).collect()
    dups = [r for r in rows if 30000000 <= r.arr_id < 40000000]
    news = [r for r in rows if r.arr_id >= 40000000]
    assert dups and news
    # every injected dup's bits were set by its history twin: a miss is a
    # broken filter, not bad luck
    assert all(r.bloom_hit and r.is_dup for r in dups)
    # injected news must never be flagged dup; bloom may false-positive
    assert all(not r.is_dup for r in news)
    fp = sum(1 for r in news if r.false_pos)
    # fill <= 3*5000/32768 ~ 0.37 -> p(fp) <= 0.37^3 ~ 5%; gate at 15%
    assert fp <= max(2, 0.15 * len(news)), (
        f"bloom false-positive rate {fp}/{len(news)}"
    )


def test_bottomk_sample_is_mergeable(spark, sf_dir):
    """Bottom-k of the union == re-ranked bottom-k of the concatenated
    per-half bottom-k's — the property that lets per-day samples compose
    into any-window quantiles."""
    from pyspark.sql import Window

    from ai_knowledge_etl_spark.sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("v"),
    )
    whole = SK.bottomk_sample(
        orders, "o_orderpriority", "o_orderkey", keep=("v",), k=64
    )
    halves = [
        SK.bottomk_sample(
            orders.where(f"o_orderkey % 2 = {i}"),
            "o_orderpriority", "o_orderkey", keep=("v",), k=64,
        )
        for i in (0, 1)
    ]
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    merged = (
        halves[0].select("grp", "v", "h")
        .unionByName(halves[1].select("grp", "v", "h"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 64)
    )
    a = {(r.grp, r.rn): r.h for r in whole.collect()}
    b = {(r.grp, r.rn): r.h for r in merged.collect()}
    assert a == b


def test_sample_quantiles_land_in_cdf_band(spark, sf_dir, duck):
    """The sampled p50/p90 must sit at the right place in the TRUE value
    distribution: F(est_p50) in [0.38, 0.62], F(est_p90) in [0.80, 0.97]
    (k=256 -> sigma ~ 3%; bands are ~4 sigma plus discreteness slack)."""
    rows = (
        REGISTRY["agg-quantile-sample-merge"].spark(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        for est, lo, hi, what in (
            (r.p50_price, 0.38, 0.62, "p50"),
            (r.p90_price, 0.80, 0.97, "p90"),
        ):
            frac = duck.execute(
                "SELECT avg(CASE WHEN CAST(o_totalprice AS DECIMAL(12,2))"
                " <= ? THEN 1.0 ELSE 0.0 END) FROM orders"
                " WHERE o_orderpriority = ?",
                [est, r.priority],
            ).fetchone()[0]
            assert lo <= frac <= hi, (
                f"{what} for {r.priority}: est={est} sits at F={frac:.3f}"
            )
