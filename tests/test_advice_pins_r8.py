"""Regression pins for the round-8 ADVICE fixes.

- BIGINT-cents accumulator widening (registry/relational.py,
  agg-pricing-summary / _REVENUE_BY_REGION_SQL / agg-welch-ttest /
  window-share-of-total / agg-important-stock): group sums of
  cents-products must not wrap at scale. Spark's non-ANSI mode wraps
  silently while DuckDB promotes sum(BIGINT) to HUGEINT, so a plain
  BIGINT accumulator is a silent cross-engine divergence around sf~14
  for sum_charge (≈8e7 rows/group x 1.1e11). The pin drives the widened
  expression shape over a synthetic frame whose sum exceeds 2^63 and
  asserts the exact (non-wrapped) total.
- register_views must key its cache on the SESSION, not applicationId
  (sources/catalog.py): spark.newSession() shares the applicationId, so
  an id-keyed cache would short-circuit for a sibling session that
  never registered anything -> 'table not found'.
- track_persist/release_persisted (session.py): per-call operator
  persists (LSH band frame, PMI pair aggregate, KMV sample) must be
  releasable deterministically at batch boundaries instead of pinning
  storage until ContextCleaner GC.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_knowledge_etl_spark.session import (
    release_persisted,
    track_persist,
)


# --- widened cents accumulators don't wrap ----------------------------------


def test_widened_charge_accumulator_exceeds_int64(spark):
    # the agg-pricing-summary sum_charge shape: per-row BIGINT product,
    # DECIMAL(38,0) accumulator. 1e5 rows x 1.1e11 ≈ 1.1e16 stays under
    # 2^63; scale the per-row value instead: 1e9 rows is unaffordable in
    # a unit test, so use 10 rows of 1e18 (inside BIGINT) whose SUM 1e19
    # exceeds 2^63 ≈ 9.22e18 — a plain BIGINT sum wraps negative.
    df = spark.range(10).select(F.lit(10**18).cast("long").alias("v"))
    # the hazard is real: ANSI mode (Spark 4.x default) hard-fails the
    # query at scale; non-ANSI wraps silently. Either way the BIGINT
    # accumulator is wrong past 2^63.
    try:
        wrapped = df.agg(F.sum("v").alias("s")).collect()[0]["s"]
        assert wrapped < 0  # non-ANSI silent wrap
    except Exception as e:  # noqa: BLE001
        assert "ARITHMETIC_OVERFLOW" in str(e)  # ANSI hard failure
    widened = df.agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    assert int(widened) == 10**19  # the widened accumulator is exact


def test_pricing_summary_sql_carries_widened_accumulators():
    from ai_knowledge_etl_spark.registry import REGISTRY, oracle_of

    sql = oracle_of(REGISTRY["agg-pricing-summary"])
    # both at-risk sums widened; qty/base_price documented-safe BIGINT
    assert sql.count("AS DECIMAL(38,0))") == 2
    rev = oracle_of(REGISTRY["sql-revenue-by-region"])
    assert "DECIMAL(38,0)" in rev


def test_share_of_total_no_bigint_cross_multiply():
    # the old rev_c * 1000000 BIGINT form wraps at rev_c > 9.2e12 (~sf10);
    # the shared-verbatim DOUBLE floor form must be in BOTH engine texts.
    from ai_knowledge_etl_spark.registry import REGISTRY, oracle_of

    sql = oracle_of(REGISTRY["window-share-of-total"])
    assert "floor(CAST(rev_c AS DOUBLE)" in sql
    assert "rev_c * 1000000 //" not in sql


# --- register_views: sibling sessions get their own views -------------------


def test_register_views_sibling_session(spark, sf_dir):
    from ai_knowledge_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    assert spark.catalog.tableExists("lineitem")
    sibling = spark.newSession()
    try:
        # same applicationId, fresh (empty) temp-view catalog: the cache
        # must NOT short-circuit — the sibling needs its own registration
        assert not sibling.catalog.tableExists("lineitem")
        register_views(sibling, sf_dir)
        assert sibling.catalog.tableExists("lineitem")
        assert sibling.sql("SELECT count(*) AS n FROM lineitem").collect()[
            0
        ]["n"] > 0
    finally:
        # re-point the module cache at the main session so later tests'
        # short-circuit path sees the session they run on
        register_views(spark, sf_dir)


def test_register_views_survives_dropped_view(spark, sf_dir):
    from ai_knowledge_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    spark.catalog.dropTempView("lineitem")
    register_views(spark, sf_dir)  # sentinel check defeats short-circuit
    assert spark.catalog.tableExists("lineitem")


# --- tracked persist release -------------------------------------------------


def test_release_persisted_drops_tracked_frames(spark):
    df = track_persist(spark.range(100).select(F.col("id")))
    assert df.count() == 100
    assert df.storageLevel.useMemory  # persisted
    n = release_persisted()
    assert n >= 1
    assert not df.storageLevel.useMemory  # released
    assert release_persisted() == 0  # idempotent, list cleared
