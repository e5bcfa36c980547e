"""Query registry — the driver correctness contract.

Every operator from SURVEY.md §2 registers here as a `QueryDef`:
a PySpark callable `(spark, sf_dir) -> DataFrame` plus (where
SQL-expressible) a DuckDB oracle SQL string computing the identical result
on the same parquet tables. `__spark_entry__.py` re-exports this registry.

Parity rules (see also sources/synthetic.py):
  - alias every computed column identically in Spark and SQL;
  - deterministic ordering for any LIMIT (explicit tiebreak column);
  - cast oracle aggregate types to BIGINT/DOUBLE (DuckDB sums are HUGEINT);
  - round floating aggregates to 2 decimals on BOTH sides (summation order
    differs between engines);
  - regexes in the Java-regex ∩ RE2 subset.
  - NO top-level array/map/struct output columns in oracled queries: the
    driver's canonicalizer sorts rows via pandas, which throws
    `unhashable type: 'list'` on list cells (CORRECTNESS_r02
    udf-embed-text). Project per-dim scalar columns, to_json(...), or an
    md5 fingerprint instead; keep the complex-typed contract in a
    composable operator + unit test (see sources_sinks.embed_text_array).
    tools/difftest.py enforces this registry-wide.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str  # op id from SURVEY.md §2
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None -> driver rows-only check
    doc: str = ""
    # Lazy oracle builder: for oracles whose expected values must be
    # COMPUTED (e.g. udf-compress-image-real bakes driver-side JPEG
    # encode sizes into a VALUES table), building at import time would
    # tax every session. Resolve through oracle_of(), never read
    # .oracle directly when this may be set.
    oracle_fn: Callable[[], str] | None = None
    # What the oracle IS (round-9 verdict #6), so ratio consumers can
    # exclude no-engine-work oracles mechanically instead of averaging
    # their meaningless per-query "ratios" into perf talk:
    #   "sql"       the oracle RECOMPUTES the transform in DuckDB —
    #               spark/duck wall ratio is an engine comparison
    #   "replay"    the oracle PREDICTS the output (VALUES table from a
    #               sequential driver replay, arithmetic closed form, or
    #               a recursive-CTE walk of the driver's own trace) —
    #               matching proves distributed==sequential equality,
    #               but the duck wall measures ~no engine work
    #   "rows_only" no oracle; driver records the weaker rows-only check
    # None → derived: oracle_fn ⇒ replay, no oracle ⇒ rows_only, else
    # sql. Static-SQL oracles that merely predict (the AV-real family's
    # metadata arithmetic) set it explicitly.
    oracle_kind: str | None = None


REGISTRY: dict[str, QueryDef] = {}

_ORACLE_CACHE: dict[str, str] = {}


def oracle_of(qd: QueryDef) -> str | None:
    """The query's oracle SQL: the static string, or the lazily built
    (and process-cached) one. None → driver rows-only check."""
    if qd.oracle is not None:
        return qd.oracle
    if qd.oracle_fn is None:
        return None
    if qd.name not in _ORACLE_CACHE:
        _ORACLE_CACHE[qd.name] = qd.oracle_fn()
    return _ORACLE_CACHE[qd.name]


def oracle_kind_of(qd: QueryDef) -> str:
    """The oracle's kind (see QueryDef.oracle_kind): explicit value if
    set, else derived from the oracle's shape."""
    if qd.oracle_kind is not None:
        return qd.oracle_kind
    if qd.oracle_fn is not None:
        return "replay"
    return "sql" if qd.oracle is not None else "rows_only"


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    oracle_fn: Callable[[], str] | None = None,
    oracle_kind: str | None = None,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QueryDef(
            name=name,
            spark=fn,
            oracle=oracle,
            doc=doc,
            oracle_fn=oracle_fn,
            oracle_kind=oracle_kind,
        )
        return fn

    return wrap


def _load_all() -> None:
    # import for side effects: each module registers its queries
    from ai_knowledge_etl_spark.registry import (  # noqa: F401
        crawl,
        curation,
        northstar,
        planning,
        quality,
        relational,
        sketches,
        sources_sinks,
        streaming,
        text_pipeline,
        training,
    )


_load_all()
