"""Source connectors and the fixture-table catalog."""

from ai_knowledge_etl_spark.sources.catalog import TABLES, load_table, load_tables  # noqa: F401
