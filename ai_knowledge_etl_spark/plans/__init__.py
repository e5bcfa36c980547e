"""Control-plane strategy operators (SURVEY §2.K) — routing, fallback
chains, complexity detection. All pure column expressions: the reference's
planner becomes a `strategy` column Catalyst constant-folds and prunes on."""

from ai_knowledge_etl_spark.plans import strategy  # noqa: F401
