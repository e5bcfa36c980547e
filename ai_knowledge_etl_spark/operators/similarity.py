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

from ai_knowledge_etl_spark.session import eager_cut


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


def ivf_assign(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid cell assignment (the IVF coarse quantizer).
    `cents` is (cent_id, ce) and must be broadcast-small. Returns
    (id, vec, cent_id) — the inverted-file lists as a DataFrame; at scale
    this is the partitioning key that turns ANN scans into equi-joins."""
    ccos = cosine(F.col("ce"), F.col(vec_col))
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("cent_id"))
    return (
        corpus.crossJoin(F.broadcast(cents))
        .select(id_col, vec_col, "cent_id", ccos.alias("ccos"))
        .withColumn("crn", F.row_number().over(w))
        .where(F.col("crn") == 1)
        .select(id_col, vec_col, "cent_id")
    )


def ivf_topk(
    cells: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """IVF-Flat probe: `queries` is (query_id, __qvec, cent_id) — each query
    scans only its own cell (nprobe=1) via a broadcast equi-join on cell id,
    then exact cosine + per-query ranking."""
    cos = cosine(F.col("__qvec"), F.col(vec_col))
    scored = cells.join(F.broadcast(queries), "cent_id").select(
        query_id_col,
        id_col,
        F.round(cos, 4).alias("cos_sim"),
        cos.alias("__exact"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__exact"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .drop("__exact")
    )


def _l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_topk(
    corpus: DataFrame,
    query_vec_id: int,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_cents: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (billion-scale serving recipe): split each
    vector into `n_sub` sub-vectors of `sub_dim` dims; per sub-space, learn a
    `n_cents`-entry codebook (one Lloyd refinement from the first n_cents
    vectors as seeds); encode every vector as n_sub small codes; score the
    query by ASYMMETRIC distance — a per-(sub-space, code) lookup table of
    exact query-to-codebook-entry L2 distances, summed over sub-spaces in
    integer e-4 space. Returns (vec_id, adist_e4, codes_fp) top-k."""
    # eager cuts (the warc-corpus discipline): `subs` feeds FOUR subtrees
    # (seed codebook, Lloyd assignment, the final encode, the query row)
    # and the refined codebook `cb` two (encode + query table) — uncut,
    # the corpus sub-vector explode re-ran per consumer and the Lloyd
    # round re-ran under both cb readers (r11 A/B at sf0.1: 2.68 ->
    # 2.32 s min-of-5). subs is n_sub narrow rows per vector; cb is
    # n_sub x n_cents rows.
    subs = eager_cut(corpus.select(
        id_col,
        vec_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
    ).select(
        id_col,
        "m",
        F.expr(f"slice({vec_col}, m * {sub_dim} + 1, {sub_dim})").alias("sv"),
    ))
    c0 = subs.where(f"{id_col} < {n_cents}").select(
        "m", F.col(id_col).alias("cent"), F.col("sv").alias("csv")
    )
    w = Window.partitionBy(id_col, "m").orderBy(F.asc("d"), F.asc("cent"))
    a1 = (
        subs.join(F.broadcast(c0), "m")
        .withColumn("d", _l2(F.col("sv"), F.col("csv")))
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(id_col, "m", "sv", "cent")
    )
    cb = eager_cut(
        a1.select("m", "cent", F.posexplode("sv").alias("pos", "val"))
        .groupBy("m", "cent", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("mu"))
        .groupBy("m", "cent")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias("pm"))
        .select("m", "cent", F.expr("transform(pm, x -> x.mu)").alias("csv"))
    )
    enc = (
        subs.join(F.broadcast(cb), "m")
        .withColumn("d", _l2(F.col("sv"), F.col("csv")))
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(id_col, "m", F.col("cent").alias("code"))
    )
    qt = (
        subs.where(f"{id_col} = {query_vec_id}")
        .select("m", "sv")
        .join(F.broadcast(cb), "m")
        .select(
            "m",
            "cent",
            F.round(_l2(F.col("sv"), F.col("csv")) * 10000)
            .cast("long")
            .alias("qd_e4"),
        )
    )
    return (
        enc.join(
            F.broadcast(qt),
            (enc["m"] == qt["m"]) & (enc["code"] == qt["cent"]),
        )
        .groupBy(id_col)
        .agg(
            F.sum("qd_e4").cast("long").alias("adist_e4"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(enc["m"], "code"))),
                        lambda x: x.getField("code").cast("string"),
                    ),
                    ",",
                )
            ).alias("codes_fp"),
        )
        .orderBy(F.asc("adist_e4"), F.asc(id_col))
        .limit(k)
    )


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    order_by_augmented: bool = False,
) -> DataFrame:
    """Maximum-inner-product top-k via the norm-augmentation reduction
    (Shrivastava & Li 2014; Bachrach et al. 2014 — public): append
    sqrt(M^2 - ||x||^2) to every corpus vector (M = max corpus norm) and 0
    to the query, and cosine over the augmented vectors orders exactly
    like the raw inner product — every augmented corpus norm is the
    constant M, the query norm is a per-query constant, so the cosine is
    dot(q, x) / (const_q * M). This is what makes MIPS (recommendation /
    rerank scoring) servable by ANY cosine-ANN index: bucket or quantize
    the AUGMENTED vectors and the existing LSH/IVF/PQ machinery applies
    unchanged. Final ranking uses the raw inner product (bit-stable across
    engines); the augmented cosine — the quantity an index would see — is
    computed alongside and tests/test_similarity_quality.py proves its
    rank-equivalence to the raw dot corpus-wide."""
    m2 = corpus.agg(
        F.max(_sq_norm(F.col(vec_col))).alias("__m2")
    )
    aug = (
        corpus.crossJoin(F.broadcast(m2))
        .select(
            id_col,
            vec_col,
            F.concat(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.array(
                    F.sqrt(
                        F.greatest(
                            F.col("__m2") - _sq_norm(F.col(vec_col)),
                            F.lit(0.0),  # max-norm row: clamp -0.0 noise
                        )
                    )
                ),
            ).alias("__aug"),
        )
    )
    q = queries.select(
        query_id_col,
        F.col(vec_col).alias("__qvec"),
        F.concat(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.array(F.lit(0.0)),
        ).alias("__qaug"),
    )
    pairs = aug.crossJoin(F.broadcast(q))
    scored = pairs.select(
        query_id_col,
        id_col,
        _dot(F.col("__qvec"), F.col(vec_col)).alias("__ip"),
        cosine(F.col("__qaug"), F.col("__aug")).alias("__aug_cos"),
    )
    # Default: rank by the RAW inner product (bit-identical left-to-right
    # double fold the oracle also computes), not the augmented cosine: the
    # cosine is ip / (const_q * M) with a per-row denominator
    # reconstruction that carries row-varying ulp rounding, so near-tie
    # inner products could order differently across engines. The
    # augmented cosine — what a cosine-ANN index over the augmented
    # vectors would bucket on — is still computed, and
    # order_by_augmented=True ranks by it so the rank-equivalence proof in
    # tests/test_similarity_quality.py exercises the reduction end-to-end.
    rank_key = "__aug_cos" if order_by_augmented else "__ip"
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(rank_key), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round(F.col("__ip"), 4).alias("inner_product"),
            "rank",
        )
    )
