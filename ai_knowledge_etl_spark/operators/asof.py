"""As-of (point-in-time) join — an operator Spark has no primitive for
(SURVEY §2.D extension; DuckDB/kdb/Pandas `merge_asof` semantics: for
each left row, the single latest right row with right.ts <= left.ts on
the same key).

Spark-first strategy: union-and-LOCF, NOT a range join. Tag both inputs,
union them, and run ONE window pass per key ordered by (ts, ref-first):
`last(value, ignorenulls)` carries the most recent reference row forward
onto every query row. Cost = one shuffle on the join key + one sort —
identical geometry to any groupBy, with none of the row explosion a
`l.ts BETWEEN r.ts AND r.ts+δ` range join suffers. At 100 TB the
key-partitioned sort is AQE-skew-splittable, and the pattern extends to
streaming as applyInPandasWithState LOCF state (one value per key).

Ties: a reference row AT the query timestamp matches (>= semantics),
enforced by sorting references before queries at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every `left` row + the latest `right` row at or
    before its timestamp (NULL-filled when none exists). `value_cols`
    are the right-side columns to carry. Output keeps all left columns
    plus `asof_<c>` for each value col and `asof_ts`."""
    lcols = left.columns
    tag_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_ref"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    tag_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_ref"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = tag_r.unionByName(tag_l, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_ref").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last(
            F.when(F.col("__is_ref") == 1, F.col("__ts")), ignorenulls=True
        ).over(w).alias("asof_ts"),
    )
    return carried.where(F.col("__is_ref") == 0).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"asof_{c}") for c in value_cols],
        "asof_ts",
    )
