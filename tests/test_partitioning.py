"""Bucketed co-located joins (zero-Exchange plan) and skew salting
(identical results, wider shuffle) — the 100 TB join strategies, proven on
the fixture tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import partitioning as P
from ai_knowledge_etl_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is a static conf, set in session.get_spark
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    P.write_bucketed(li, "li_b", "l_orderkey", 8)
    P.write_bucketed(o, "o_b", "l_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # at fixture scale the planner prefers broadcast (correct!); disable it
    # to expose the co-located sort-merge path that matters at 100 TB
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = P.bucketed_join(spark, "li_b", "o_b", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should be co-located"
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    want = li.join(o, "l_orderkey").count()
    got = P.bucketed_join(spark, "li_b", "o_b", "l_orderkey").count()
    assert got == want


def test_salted_join_same_result(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    plain = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("l_quantity").alias("q"))
    )
    li2 = li.withColumnRenamed("l_suppkey", "k")
    s2 = s.withColumnRenamed("s_suppkey", "k")
    salted = (
        P.salted_join(li2, s2, "k", n_salts=4)
        .groupBy("s_name")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )



def test_zorder_clusters_both_dimensions(spark):
    """Z-order layout: per-partition spans stay narrow on BOTH columns,
    where a single-column sort leaves the other column spanning ~the full
    range. Uses the span product as a proxy for parquet min/max pruning."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators.partitioning import zorder_key

    n = 1 << 14
    bits = 7  # both dims in [0, 128)
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.pmod(F.xxhash64("id"), F.lit(128))).alias("y"),
    )

    def file_stats(frame, order_col):
        """per-'file' (partition) min/max footer stats, as pruning sees them"""
        return (
            frame.repartitionByRange(16, order_col)
            .sortWithinPartitions(order_col)
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            )
            .collect()
        )

    def files_hit(stats, col, lo, hi):
        a, b = (("x0", "x1") if col == "x" else ("y0", "y1"))
        return sum(1 for r in stats if r[a] <= hi and r[b] >= lo)

    xsorted = file_stats(df, "x")
    zdf = df.withColumn("z", zorder_key("x", "y", bits))
    zordered = file_stats(zdf, "z")

    # narrow range filter on x: both layouts prune well
    assert files_hit(xsorted, "x", 10, 19) <= 4
    assert files_hit(zordered, "x", 10, 19) <= 8
    # narrow range filter on y: x-sort reads EVERY file, z-order skips most
    assert files_hit(xsorted, "y", 10, 19) == 16
    assert files_hit(zordered, "y", 10, 19) <= 8


def test_zorder_key_is_bijective_interleave(spark):
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators.partitioning import zorder_key

    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    out = df.withColumn("z", zorder_key("x", "y", 4))
    assert out.select("z").distinct().count() == 256
    # known value: x=0b11, y=0b01 -> z interleaves to 0b0111 = 7
    row = out.where((F.col("x") == 3) & (F.col("y") == 1)).collect()[0]
    assert row["z"] == 7


def test_write_zordered_files_cover_rectangles(spark, tmp_path):
    """End-to-end layout check: each parquet file written by write_zordered
    covers a bounded rectangle of (x, y), so footer stats prune on either
    column; a y-filter skips most files where an x-sorted write skips none."""
    import glob

    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators.partitioning import write_zordered

    df = spark.range(1 << 14).select(
        (F.col("id") % 128).alias("x"),
        (F.pmod(F.xxhash64("id"), F.lit(128))).alias("y"),
    )
    path = str(tmp_path / "zorder")
    write_zordered(df, path, "x", "y", bits=7, n_files=16)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) >= 12  # range partitioner may merge a boundary or two
    hit = 0
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("y").alias("y0"), F.max("y").alias("y1")
        ).collect()[0]
        if r["y0"] <= 19 and r["y1"] >= 10:
            hit += 1
    assert hit <= len(files) // 2, f"{hit}/{len(files)} files hit"


def test_results_invariant_under_shuffle_partitioning(spark, sf_dir):
    """Re-running representative queries (windows, top-k with ties,
    hash-keyed sampling, arg-extremum joins, iterative CC) under a
    different shuffle.partitions setting must give identical rows —
    catches partitioning-sensitive nondeterminism that a single-setting
    oracle diff cannot see."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    names = [
        "topk-pages-report",
        "window-page-id",
        "agg-top-event-per-user",
        "sample-domain-reweight",
        "agg-vocab-topk",
        "dedup-cluster-cc",
        "agg-touch-attribution",
        "join-min-cost-supplier",
        # round-2 additions: fingerprint keep-first, integer-millinat
        # DSIR sums, md5-threshold mixtures, the composed pipelines
        "dedup-paragraph",
        "sample-importance-reweight",
        "sample-temperature-mixture",
        "pipeline-curate-corpus",
        "pipeline-crawl-e2e",
        # round-3: the Common-Crawl entry pipeline (WARC scan → gates →
        # paragraph+LSH dedup → DSIR top-N)
        "pipeline-warc-corpus",
        "pipeline-training-set",
        "dedup-substring-span",
        # round-4 sketches: KMV's ranking window + cutoff and the CMS
        # min-over-rows must not depend on how hashes land in partitions
        "agg-countmin-heavyhitters",
        "agg-kmv-distinct-setops",
        "dedup-bloom-gate",
        "agg-quantile-sample-merge",
    ]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for setting in ("3", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", setting)
            for name in names:
                rows = sorted(
                    map(tuple, REGISTRY[name].spark(spark, sf_dir).collect())
                )
                results.setdefault(name, []).append(rows)
        for name, (a, b) in results.items():
            assert a == b, f"{name} changed under repartitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_zonemap_prune_payoff(spark, sf_dir):
    """The registry's zone-map simulation must show the actual payoff:
    the linear layout's files all span the price range (no pruning),
    the z-order layout prunes most files for the same predicate."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    rows = {
        r["layout"]: r
        for r in REGISTRY["agg-zonemap-prune"].spark(spark, sf_dir).collect()
    }
    lin, zo = rows["linear"], rows["zorder"]
    assert lin["files_hit"] == lin["files_total"], "linear layout prunes nothing"
    assert zo["files_hit"] <= zo["files_total"] // 2, (
        f"z-order should prune most files, hit {zo['files_hit']}/"
        f"{zo['files_total']}"
    )
