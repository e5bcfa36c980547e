"""Unit tests for the training-data extension operators (clustering,
sampling, packing, PII redaction) — properties the oracle diff can't
express: multi-round convergence, determinism across runs, invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import clustering, packing, sampling
from ai_knowledge_etl_spark.sources.catalog import load_table


def test_connected_components_chain_needs_multiple_rounds(spark):
    """A 6-node path graph has diameter 5 — one propagation round is NOT
    enough, so this asserts the loop actually iterates to fixpoint."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)], ["a", "b"]
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in clustering.connected_components(edges).collect()
    }
    assert got == {(n, 1) for n in range(1, 7)} | {(10, 10), (11, 10)}


def test_connected_components_merges_via_shared_node(spark):
    edges = spark.createDataFrame([(7, 3), (3, 9), (9, 1)], ["a", "b"])
    labels = {
        r["node"]: r["cluster_id"]
        for r in clustering.connected_components(edges).collect()
    }
    assert set(labels.values()) == {1}


def test_canonical_clusters_one_canonical_per_cluster(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["a", "b"])
    df = clustering.canonical_clusters(edges)
    rows = df.collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert set(by_cluster) == {1, 5}
    for cid, members in by_cluster.items():
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1 and canon[0]["doc_id"] == cid
        assert all(m["n_members"] == len(members) for m in members)


def test_hash_sample_deterministic_and_subset(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    s1 = sampling.deterministic_sample(d, "doc_id", "40")
    s2 = sampling.deterministic_sample(d, "doc_id", "40")
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2 and 0 < len(ids1) < d.count()
    # a wider threshold strictly contains a narrower one
    wide = {
        r["doc_id"]
        for r in sampling.deterministic_sample(d, "doc_id", "80")
        .select("doc_id")
        .collect()
    }
    assert set(ids1) <= wide


def test_train_val_test_exhaustive_disjoint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    split = sampling.train_val_test(d, "doc_id")
    assert split.count() == d.count()  # every row gets exactly one split
    counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]


def test_pack_sequences_invariants(spark, sf_dir):
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        )
    )
    packed = packing.concat_chunk_pack(
        d, "doc_id", "n_tok", budget=512, partition_col="source"
    )
    rows = packed.orderBy("source", "doc_id").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, docs in by_src.items():
        cum = 0
        for r in docs:
            assert r["cum_prev"] == cum, f"{src}: cumsum mismatch"
            assert r["first_window"] == cum // 512
            assert r["last_window"] == (cum + r["n_tok"] - 1) // 512
            assert r["n_windows"] == r["last_window"] - r["first_window"] + 1
            cum += r["n_tok"]


def test_redact_pii_leaves_no_matches(spark, sf_dir):
    from ai_knowledge_etl_spark.functions import text as TX

    d = load_table(spark, sf_dir, "documents").limit(50)
    synth = d.select(
        F.concat(
            "text",
            F.lit(" mail me: a.b+c@x-y.example.org tel +44 (0)20 7946-0958"),
            F.lit(" visa 4111111111111111 done"),
        ).alias("text")
    )
    red = synth.select(TX.redact_pii("text").alias("red"))
    leftovers = red.where(
        F.col("red").rlike(TX.PII_EMAIL)
        | F.col("red").rlike(TX.PII_CARD)
    ).count()
    assert leftovers == 0
    tagged = red.where(
        F.col("red").contains("<EMAIL>")
        & F.col("red").contains("<CARD>")
        & F.col("red").contains("<PHONE>")
    ).count()
    assert tagged == 50


def test_hashed_shingles_give_identical_jaccard_pairs(spark, sf_dir):
    """The int64-hashed production path must produce the same near-dup
    pairs as the string-shingle oracle path (collisions are ~impossible
    at fixture scale; this guards the wiring, e.g. hashing without the
    blocking column)."""
    from ai_knowledge_etl_spark.operators import dedup
    from ai_knowledge_etl_spark.registry.northstar import _dup_corpus

    sh = dedup.shingles(
        _dup_corpus(spark, sf_dir), "doc_id", "text", n=3, keep=("source",)
    )
    want = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(
            sh, "doc_id", "source", threshold=0.6
        ).collect()
    }
    hashed = dedup.hash_shingles(sh, group_col="source")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(
            hashed, "doc_id", "source", threshold=0.6
        ).collect()
    }
    assert got == want and len(want) > 0


def test_contamination_flags_every_eval_source_doc(spark, sf_dir):
    """Property: every doc whose 120-char prefix seeded the eval set must
    flag itself (its own prefix shingles are a subset of its shingles),
    provided the prefix holds >= 3 distinct 5-grams."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    flagged = {
        r["doc_id"]
        for r in REGISTRY["filter-contamination-ngram"]
        .spark(spark, sf_dir)
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    seeds = docs.where(F.col("doc_id") % 25 == 0).select(
        "doc_id", F.substring("text", 1, 120).alias("prefix")
    )
    for r in seeds.collect():
        n_words = len(r["prefix"].split(" "))
        n_grams = max(n_words - 4, 1)
        if n_grams >= 3:
            assert r["doc_id"] in flagged, r["doc_id"]


def test_domain_reweight_is_deterministic_and_bounded(spark, sf_dir):
    """Property: the md5-threshold sample never exceeds the group size,
    never empties a group whose rate is 1.0 (n_docs <= mean), and two
    evaluations select identical counts (no RNG anywhere)."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    q = REGISTRY["sample-domain-reweight"].spark
    a = {r["source"]: r.asDict() for r in q(spark, sf_dir).collect()}
    b = {r["source"]: r.asDict() for r in q(spark, sf_dir).collect()}
    assert a == b
    total = sum(r["n_docs"] for r in a.values())
    mean = total / len(a)
    for src, r in a.items():
        assert 0 < r["n_sampled"] <= r["n_docs"], src
        if r["n_docs"] <= mean:
            # rate 1.0 -> threshold t_int == 2^32 -> every row kept
            assert r["n_sampled"] == r["n_docs"], src


def test_vocab_topk_rank_and_monotonicity(spark, sf_dir):
    """Property: ranks are contiguous from 1, counts are non-increasing
    along the rank order, and ties are broken by token ascending."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    rows = sorted(
        REGISTRY["agg-vocab-topk"].spark(spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert prev["cnt"] > cur["cnt"] or (
            prev["cnt"] == cur["cnt"] and prev["token"] < cur["token"]
        )


def test_temperature_mixture_saturated_rate_keeps_all(spark, tmp_path):
    """Regression (round-3 advisor): when the per-lang keep-rate saturates
    at 1.0, t_int = 2^20 formats as the 6-char '100000'; a bare %05x
    threshold against a 5-char tag would lexicographically keep only ~6%
    of docs. With the lpad-to-6/%06x construction every doc of the rare
    language must survive — in BOTH engines."""
    import duckdb

    from ai_knowledge_etl_spark.registry import REGISTRY

    # 3 docs of 'xx' among 1200 'en': budget 300 * smoothed weight makes
    # 300*w/(ws*n_docs) >> 1 for 'xx', so least(1.0, ...) fires.
    rows = [(i, f"text {i}", "en" if i < 1200 else "xx", "s", 7)
            for i in range(1203)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(d)

    qd = REGISTRY["sample-temperature-mixture"]
    got = {r["lang"]: r.asDict() for r in
           qd.spark(spark, str(tmp_path)).collect()}
    assert got["xx"]["t_int"] == 1048576  # saturated
    assert got["xx"]["n_sampled"] == got["xx"]["n_docs"] == 3

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    oracle = {r[0]: r for r in con.execute(qd.oracle).fetchall()}
    assert oracle["xx"][3] == 3  # n_sampled
    assert {k: (v["n_docs"], v["t_int"], v["n_sampled"])
            for k, v in got.items()} == {
        k: (r[1], r[2], r[3]) for k, r in oracle.items()
    }


def test_bpe_train_merges_known_sequence(spark):
    """Hand-checkable BPE: vocabulary {abab x10, ab x5}. Round 1 pairs:
    a:b = 2*10 + 5 = 25, b:a = 10 -> merge a:b, and BOTH adjacent
    occurrences in 'a b a b' must merge in this single round (the
    expand-replace-collapse run-merge). Round 2: ab:ab = 10 -> merge.
    Round 3: no adjacent pairs remain -> loop stops early."""
    from ai_knowledge_etl_spark.operators import bpe

    words = spark.createDataFrame(
        [("abab", 10), ("ab", 5)], "w string, wc long"
    )
    merges, final = bpe.train_merges(bpe.to_symbols(words), n_rounds=5)
    assert merges == [(1, "a:b", 25), (2, "ab:ab", 10)]
    vocab = {
        r["w"]: r["n_sym"]
        for r in bpe.vocab_symbol_counts(final).collect()
    }
    assert vocab == {"abab": 1, "ab": 1}


def test_balanced_classes_actually_balance(spark, sf_dir):
    """Every class's kept count must land near the minority count: the
    md5 gate is binomial around mn, so 25% tolerance is generous at
    fixture sizes. Keep decisions must also be a subset per class."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    rows = REGISTRY["sample-balanced-classes"].spark(spark, sf_dir).collect()
    assert len(rows) >= 2
    mn = min(r["n_orig"] for r in rows)
    for r in rows:
        assert r["n_kept"] <= r["n_orig"]
        assert abs(r["n_kept"] - mn) <= max(0.25 * mn, 8.0), (
            r["event_type"], r["n_kept"], mn,
        )
