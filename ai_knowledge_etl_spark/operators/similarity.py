"""Similarity search over embedding columns (north-star: BASELINE.json l.6).

Two paths:

  - **Brute-force cosine top-k** — broadcast the query vectors, fold the dot
    product JVM-side with zip_with + aggregate (sequential fold → the
    engine-portable summation order the oracle reproduces), rank with a
    per-query window. Exact; O(|queries| × |corpus|); right whenever the
    query set is broadcastable.
  - **Sign-LSH bucketed top-k** — bucket every vector by the sign pattern of
    its leading dimensions (axis-aligned random-hyperplane LSH), join
    queries to same-bucket candidates only, then rank. Approximate; the
    candidate join is equi-key, so at 100 TB it shuffles on a small int
    bucket id instead of exploding all pairs. More planes → smaller buckets.

No Python UDFs anywhere: at 100 TB the fold stays inside whole-stage
codegen. (A pandas-UDF + numpy batch variant only wins when vectors are
wide enough to amortize Arrow transfer; at dim=64 the JVM fold wins.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_sq_norm(a)) * F.sqrt(_sq_norm(b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: every query row against every corpus row.
    `queries` must be broadcast-small (it is hinted)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    pairs = corpus.crossJoin(F.broadcast(q))
    scored = pairs.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("__qvec"), F.col(vec_col)), 4).alias("cos_sim"),
        cosine(F.col("__qvec"), F.col(vec_col)).alias("__exact"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__exact"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .drop("__exact")
    )


def sign_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket: bit i set iff vec[i] > 0."""
    terms = [
        F.when(F.element_at(vec, i + 1) > 0, 2**i).otherwise(0)
        for i in range(n_planes)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket."""
    c = corpus.withColumn("__bucket", sign_bucket(F.col(vec_col), n_planes))
    q = queries.select(
        query_id_col,
        F.col(vec_col).alias("__qvec"),
        sign_bucket(F.col(vec_col), n_planes).alias("__bucket"),
    )
    pairs = c.join(F.broadcast(q), "__bucket")
    scored = pairs.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("__qvec"), F.col(vec_col)), 4).alias("cos_sim"),
        cosine(F.col("__qvec"), F.col(vec_col)).alias("__exact"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__exact"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .drop("__exact")
    )
