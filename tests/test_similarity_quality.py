"""ANN quality gates: the approximate paths (LSH buckets, IVF cells) must
actually FIND most of what brute force finds — recall@k, not just row
counts. If a refactor silently degrades bucketing, these fail."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_knowledge_etl_spark.registry import REGISTRY


def _topk_sets(df, query_col="query_id", nbr_col="vec_id"):
    out = {}
    for r in df.collect():
        out.setdefault(r[query_col], set()).add(r[nbr_col])
    return out


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    exact = _topk_sets(REGISTRY["similarity-topk"].spark(spark, sf_dir))
    approx = _topk_sets(
        REGISTRY["similarity-lsh-bucketed"].spark(spark, sf_dir)
    )
    # LSH returns top-5 per query vs brute-force top-10: measure recall of
    # the approximate neighbors against the exact top-10 superset
    hits = sum(
        len(approx.get(q, set()) & exact[q]) for q in exact
    )
    total = sum(len(approx.get(q, set())) for q in exact)
    assert total > 0
    precision_vs_exact10 = hits / total
    # fixture embeddings are RANDOM 64-dim vectors, so exact top-10 is a
    # weak-signal ranking; a random candidate would land in it with
    # p = 10/corpus ~ 0.005. Sign-LSH measured ~0.38 — ~75x random. The
    # gate guards against bucketing regressions (e.g. hashing the wrong
    # column), not against noise: anything above 20x random passes.
    corpus_n = max(len(v) for v in exact.values()) * 200  # ~2000
    assert precision_vs_exact10 >= 0.1, (
        f"LSH quality collapsed to {precision_vs_exact10:.2f} "
        f"(random baseline ~{10 / corpus_n:.4f})"
    )


def test_ivf_assigns_every_vector_once(spark, sf_dir):
    df = REGISTRY["similarity-kmeans-ann"].spark(spark, sf_dir)
    rows = df.collect()
    n_total = sum(r["n_vecs"] for r in rows)
    from ai_knowledge_etl_spark.sources.catalog import load_table

    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert n_total == n_emb  # partition of the corpus, nothing dropped
    assert all(r["avg_dist"] >= 0 for r in rows)


def _recall(approx: dict, exact: dict) -> float:
    hits = sum(len(approx.get(q, set()) & exact[q]) for q in exact)
    return hits / sum(len(v) for v in exact.values())


def _planted(spark, n_clusters, per_cluster, noise, seed=7):
    """Clustered corpus (the data regime ANN indexes actually serve): the
    first n_clusters ids are the exact centers, followed by noisy members."""
    import numpy as np

    from ai_knowledge_etl_spark.operators import similarity

    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_clusters, 64))
    pts = [centers[i] for i in range(n_clusters)]
    for c in range(n_clusters):
        for _ in range(per_cluster - 1):
            pts.append(centers[c] + noise * rng.normal(0, 1, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(pts)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, [float(x) for x in centers[i]]) for i in range(n_clusters)],
        "cent_id long, ce array<double>",
    )
    return emb, cents, rows, similarity


def test_ivf_recall_gate_planted(spark):
    """Recall@10 >= 0.8 on clustered data (round-3 verdict #5): parity
    proves determinism; this proves the index FINDS the neighbors. On
    clustered data the true neighbors share the query's cell, so nprobe=1
    IVF must recover essentially all of them. (The fixture embeddings are
    uniform random — there recall is structurally low for ANY cell-probing
    index; see test_ivf_recall_floor_fixture.)"""
    from pyspark.sql import functions as F

    emb, cents, _, similarity = _planted(spark, 16, 20, 0.15)
    cells = similarity.ivf_assign(emb, cents)
    qids = [5, 45, 85, 125, 165]
    q = cells.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qvec"),
        "cent_id",
    )
    approx = _topk_sets(similarity.ivf_topk(cells, q, k=10))
    exact = _topk_sets(
        similarity.cosine_topk(
            emb,
            emb.where(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            k=10,
        )
    )
    rec = _recall(approx, exact)
    assert rec >= 0.8, f"IVF recall@10 on clustered data: {rec:.2f}"


def test_pq_candidate_recall_gate_planted(spark):
    """PQ is a candidate generator (codes within a cluster collapse, so
    within-cell ranking is exact-rerank's job): the exact top-10 must sit
    inside the PQ top-60 candidate set with recall >= 0.8."""
    import numpy as np

    emb, _, rows, similarity = _planted(spark, 4, 50, 0.1)
    V = {i: np.array(v) for i, v in rows}
    q0 = V[0]
    exact10 = {
        vid
        for _, vid in sorted(
            (float(np.sum((v - q0) ** 2)), vid) for vid, v in V.items()
        )[:10]
    }
    cand = similarity.pq_topk(
        emb, query_vec_id=0, n_sub=8, sub_dim=8, n_cents=4, k=60
    )
    cset = {r["vec_id"] for r in cand.collect()}
    rec = len(cset & exact10) / 10
    assert rec >= 0.8, f"PQ candidate recall on clustered data: {rec:.2f}"


def test_ivf_recall_floor_fixture(spark, sf_dir):
    """Fixture embeddings are uniform random: exact neighbors barely
    correlate with cells, so the honest gate is 'far above random', not
    0.8. Random recall@5 here is 5/corpus (~0.01); measured ~0.36.
    Guards against routing regressions (e.g. probing the wrong cell)."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators import similarity
    from ai_knowledge_etl_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.where("vec_id >= 100 and vec_id < 105").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _topk_sets(similarity.cosine_topk(emb, qs, k=5))
    approx = _topk_sets(REGISTRY["similarity-ivf"].spark(spark, sf_dir))
    rec = _recall(approx, exact)
    assert rec >= 0.15, f"IVF fixture recall collapsed: {rec:.2f}"


def test_mips_reduction_is_rank_equivalent(spark, sf_dir):
    """The norm-augmentation reduction must order candidates EXACTLY like
    the raw inner product — corpus-wide, every query, every rank (not
    recall: the reduction is mathematically exact, so any disagreement is
    an implementation bug, e.g. augmenting with the wrong norm)."""
    from ai_knowledge_etl_spark.operators import similarity
    from ai_knowledge_etl_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # order_by_augmented=True ranks by the augmented cosine (the quantity
    # an ANN index over augmented vectors would see) — the production
    # default ranks by the raw dot, so this flag is what makes the test
    # actually exercise the reduction's ordering.
    via_reduction = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in similarity.mips_topk(
            emb, queries, k=20, order_by_augmented=True
        ).collect()
    }

    # direct inner-product ranking, no augmentation
    q = queries.select("query_id", F.col("embedding").alias("__qvec"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        similarity._dot(F.col("__qvec"), F.col("embedding")).alias("ip"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("ip"), F.asc("vec_id")
    )
    direct = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in scored.withColumn(
            "rank", F.row_number().over(w)
        ).where(F.col("rank") <= 20).collect()
    }
    assert via_reduction == direct
