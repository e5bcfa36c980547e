"""Fixture-table catalog.

Loads the driver-generated parquet tables (see /root/repo/TESTDATA.md) and
registers them as temp views. At 100 TB these reads stay efficient because
every downstream operator selects explicit columns (parquet column pruning)
and filters early (predicate pushdown) — verified in tests via
`explain()` containing PushedFilters/ReadSchema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_SHIPPED: set[int] = set()
_ZIP_PATH: str | None = None
_SHIP_LOCK = __import__("threading").Lock()


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to Spark's Python workers via addPyFile.

    The driver harness imports `__spark_entry__` from an arbitrary cwd; the
    python workers it forks do NOT inherit the driver's sys.path insert, so
    any mapInPandas kernel referencing package code would fail with
    ModuleNotFoundError. The package is zipped once per process (into a
    fresh mkdtemp — pid-based names collide across pid reuse, and Spark
    rejects an addPyFile whose basename was seen with different contents)
    and added per session. Lock-guarded: bench submits queries from
    concurrent threads."""
    global _ZIP_PATH
    sid = id(spark)
    if sid in _SHIPPED:
        return
    with _SHIP_LOCK:
        if sid in _SHIPPED:
            return
        if _ZIP_PATH is None:
            import shutil
            import tempfile

            import ai_knowledge_etl_spark as pkg

            pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
            staging = tempfile.mkdtemp(prefix="ai_knowledge_etl_spark_ship_")
            _ZIP_PATH = shutil.make_archive(
                os.path.join(staging, "ai_knowledge_etl_spark_pkg"),
                "zip",
                os.path.dirname(pkg_dir),
                "ai_knowledge_etl_spark",
            )
        spark.sparkContext.addPyFile(_ZIP_PATH)
        _SHIPPED.add(sid)


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_package_on_workers(spark)
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as an int64 nanosecond epoch instead.
        # Runtime-settable, so this works under the driver's own session.
        # Parity convention: Spark `ts` (BIGINT ns) == DuckDB `epoch_ns(ts)`.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
