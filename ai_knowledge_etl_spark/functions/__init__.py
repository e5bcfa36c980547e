"""Scalar column-expression kernels.

Everything here returns pyspark.sql.Column built purely from built-in
`pyspark.sql.functions` — JVM-side, whole-stage-codegen'd, no Python UDFs.
That keeps the reference's scalar semantics (URL handling, relevance scoring,
text flags) on the Catalyst fast path at any scale.
"""

from ai_knowledge_etl_spark.functions import scoring, text, urls  # noqa: F401
