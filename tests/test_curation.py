"""Corpus-curation wave 2: paragraph dedup, SemDeDup, DSIR reweighting."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import curation as CU
from ai_knowledge_etl_spark.sources import synthetic as syn
from ai_knowledge_etl_spark.sources.catalog import load_table


def _pdocs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(syn.PARA_TEXT_EXPR).alias("ptext")
    )


def test_paragraph_dedup_keeps_each_paragraph_exactly_once(spark, sf_dir):
    """Across the whole corpus, every distinct paragraph string survives in
    exactly one document (its first occurrence)."""
    out = CU.paragraph_dedup(_pdocs(spark, sf_dir))
    kept_paras = (
        out.select(
            F.explode(F.split("text_kept", CU.PARA_SEP)).alias("para")
        )
        .where(F.length(F.trim("para")) > 0)
        .groupBy("para")
        .count()
    )
    assert kept_paras.where("count > 1").count() == 0
    # the boilerplate footers appear in ~125 docs each but survive once
    boiler = kept_paras.where(
        F.col("para") == "subscribe to our newsletter for the latest updates"
    )
    assert boiler.count() == 1


def test_paragraph_dedup_union_of_kept_equals_distinct_input(spark, sf_dir):
    """Reassembly loses nothing: the set of surviving paragraphs equals the
    set of distinct input paragraphs."""
    docs = _pdocs(spark, sf_dir)
    paras = CU.split_paragraphs(docs)
    n_distinct = paras.select("para").distinct().count()
    out = CU.paragraph_dedup(docs)
    assert out.agg(F.sum("n_kept")).collect()[0][0] == n_distinct
    # docs fully boilerplate would yield empty text; here every doc keeps
    # its unique tail paragraph at minimum
    assert out.where("n_kept = 0").count() == 0


def test_semantic_dedup_drops_injected_near_duplicates(spark, sf_dir):
    from ai_knowledge_etl_spark.registry.sources_sinks import _emb_dup_corpus

    corpus = _emb_dup_corpus(spark, sf_dir)
    cents = corpus.where("vec_id < 8").select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    out = CU.semantic_dedup(corpus, cents, threshold=0.95)
    assert out.count() == corpus.count()  # one verdict per vector
    # every injected scaled copy (id >= 10000000) sits at cosine 1.0 to its
    # original (scaling preserves direction) → must be dropped
    injected = out.where("vec_id >= 10000000")
    assert injected.count() > 0
    assert injected.where("kept").count() == 0
    # originals survive (they are the lowest id of their pair)
    assert out.where("vec_id < 10000000 AND NOT kept").count() == 0


def test_importance_scores_favor_target_slice(spark, sf_dir):
    """DSIR sanity: averaged over the corpus, target-slice (lang='en') docs
    must score higher than non-target docs under the target-vs-corpus
    log-ratio weights."""
    docs = load_table(spark, sf_dir, "documents")
    scores = CU.importance_scores(docs, "lang = 'en'").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    avg = {
        r["is_en"]: r["avg_score"]
        for r in scores.groupBy(
            (F.col("lang") == "en").alias("is_en")
        )
        .agg(F.avg("score_millinats").alias("avg_score"))
        .collect()
    }
    assert avg[True] > avg[False]


def test_importance_scores_partitioning_invariant(spark, sf_dir):
    """Integer-millinat weights make the per-doc sum associative: scores are
    byte-identical when the corpus arrives in a different partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    a = CU.importance_scores(docs, "lang = 'en'").collect()
    b = CU.importance_scores(docs.repartition(7, "source"), "lang = 'en'").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_semantic_cluster_cap_is_noop_at_fixture(spark, sf_dir):
    """The registered cap (1000) must not change a single verdict at
    fixture scale — max observed cluster is 326 at sf0.1 — so the capped
    query and the uncapped operator agree row-for-row (cap_shingle_df
    no-op discipline, VERDICT r2 #2)."""
    from ai_knowledge_etl_spark.registry.curation import _SEM_MAX_CLUSTER
    from ai_knowledge_etl_spark.registry.sources_sinks import _emb_dup_corpus

    corpus = _emb_dup_corpus(spark, sf_dir)
    cents = corpus.where("vec_id < 8").select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    uncapped = CU.semantic_dedup(corpus, cents, threshold=0.95)
    capped = CU.semantic_dedup(
        corpus, cents, threshold=0.95, max_cluster_size=_SEM_MAX_CLUSTER
    )
    assert {tuple(r) for r in capped.collect()} == {
        tuple(r) for r in uncapped.collect()
    }


def test_semantic_cluster_cap_excludes_mega_cluster(spark):
    """Degenerate centroid set (one centroid → one mega-cluster): with a
    cap below the cluster size, NO pair join runs for that cluster and
    every member is kept — bounded work instead of |cluster|² fanout."""
    import pandas as pd

    n = 60
    pdf = pd.DataFrame(
        {
            "vec_id": range(n),
            # all identical direction → cosine 1.0 for every pair
            "embedding": [[1.0, 2.0, 3.0, 4.0]] * n,
        }
    )
    vecs = spark.createDataFrame(pdf)
    cents = spark.createDataFrame(
        pd.DataFrame({"cent_id": [0], "ce": [[1.0, 2.0, 3.0, 4.0]]})
    )
    capped = CU.semantic_dedup(vecs, cents, max_cluster_size=50)
    assert capped.where("NOT kept").count() == 0  # mega-cluster skipped
    uncapped = CU.semantic_dedup(vecs, cents)
    assert uncapped.where("NOT kept").count() == n - 1  # sanity: dup-heavy


def test_warc_corpus_pipeline_gates_and_dedup(spark, sf_dir):
    """Behavioral checks on pipeline-warc-corpus the hash oracle can't
    localize when they fail: corrupted records never surface, spam docs
    never pass the repetition gate, and the clone wave is (mostly)
    removed by LSH with the lower id surviving."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    rows = REGISTRY["pipeline-warc-corpus"].spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    ids = {r["doc_id"] for r in rows}
    for i in ids:
        assert i % 13 != 0, "corrupted WARC record leaked through resync"
        if i < 10000000:
            assert i % 8 != 0, "spam doc survived the Gopher gate"
    # ~50 clones enter the corpus and ~40 pass the gates; banded LSH
    # (4 bands of 2 at Jaccard ~0.7) deterministically catches the large
    # majority (35 at sf0.001 — the oracle replays the exact set, so a
    # few surviving clones are expected, not a bug). Assert bulk removal:
    # far fewer clones in the top-100 than the gate survivors.
    n_clones_out = sum(1 for i in ids if i >= 10000000)
    assert n_clones_out <= 15, f"{n_clones_out} clones survived LSH dedup"


def test_substring_span_census_properties(spark, sf_dir):
    """Properties the hash oracle can't localize: boilerplate-carrying
    docs (doc_id%4 in (0,1)) must show duplicate spans except the corpus
    owners; a doc's dup count never exceeds its window count; and the
    first corpus doc of each boilerplate class owns its spans."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    rows = {r["doc_id"]: r for r in
            REGISTRY["dedup-substring-span"].spark(spark, sf_dir).collect()}
    assert all(0 <= r["n_dup_windows"] <= r["n_windows"]
               for r in rows.values())
    # boilerplate footers are shared by ~125 docs each: every non-owner
    # carrier has dup windows
    carriers = [i for i in rows if i % 4 in (0, 1)]
    dup_carriers = [i for i in carriers if rows[i]["n_dup_windows"] > 0]
    assert len(dup_carriers) >= len(carriers) - 2  # owners may be clean
    # docs with all-unique text (%4 in (2,3)) mostly clean
    clean = [i for i in rows if i % 4 in (2, 3)]
    assert sum(rows[i]["n_dup_windows"] == 0 for i in clean) > len(clean) // 2


def test_substring_span_ownership_beyond_1m_windows(spark):
    """Long-doc ownership regression (round-3 verdict #2): with an integer
    `doc_id*1e6 + pos` fold, a window at pos > 1M in a low-id doc computes a
    LARGER ownership key than the same window at pos 1 in the next doc, so
    the true first-occurrence owner loses. The struct-min key must assign
    ownership to (doc_id=1, pos≈1.2M) over (doc_id=2, pos=1)."""
    marker = "zq zr zs zt zu"  # 5 distinct tokens → one shared 5-gram
    n_fill = 1_200_000
    filler = " ".join(f"w{i}" for i in range(n_fill))
    long_doc = filler + " " + marker
    docs = spark.createDataFrame(
        [(1, long_doc), (2, marker + " tail1 tail2 tail3 tail4")],
        "doc_id long, ptext string",
    )
    rows = {
        r["doc_id"]: r
        for r in CU.duplicate_window_census(
            docs, "doc_id", "ptext", k=5
        ).collect()
    }
    # doc 1 owns the marker window (first corpus occurrence by (id, pos)):
    # none of its windows are duplicates; doc 2's copy is the duplicate.
    assert rows[1]["n_dup_windows"] == 0
    assert rows[2]["n_dup_windows"] == 1
    assert rows[1]["n_windows"] == n_fill + 1


def test_substring_span_counts_match_window_stream_on_edge_shapes(spark):
    """r11 optimization pin: n_windows is now computed arithmetically
    (sum of greatest(size(ws)-k+1, 1) over the word arrays) instead of
    counting the md5-window explode. The two must agree on every edge
    shape the explode can produce — empty string (split -> ['']),
    single word, exactly k tokens, k-1 tokens, and a long doc."""
    docs = spark.createDataFrame(
        [
            (1, ""),                               # split -> [''] (1 window)
            (2, "one"),                            # 1 token
            (3, "a b c d"),                        # k-1 tokens -> 1 window
            (4, "a b c d e"),                      # exactly k -> 1 window
            (5, "a b c d e f g"),                  # k+2 -> 3 windows
            (6, " ".join(f"w{i}" for i in range(40))),  # 36 windows
        ],
        "doc_id long, ptext string",
    )
    out = {
        r["doc_id"]: r["n_windows"]
        for r in CU.duplicate_window_census(
            docs, "doc_id", "ptext", k=5
        ).collect()
    }
    # ground truth: count the rows the fingerprint explode itself emits
    k = 5
    words = docs.select("doc_id", F.split("ptext", " ").alias("ws"))
    exploded = words.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(size(ws) - {k - 1}, 1)),"
                f" i -> i)"
            )
        ).alias("pos0", "x"),
    ).groupBy("doc_id").count()
    truth = {r["doc_id"]: r["count"] for r in exploded.collect()}
    assert out == truth
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 3, 6: 36}
