"""Quality/retrieval wave semantics: Gopher-style repetition gates, unigram
LM scoring, BM25, watermark late-data accounting, graph link prediction.
The exact-value parity lives in tools/difftest.py; these tests pin the
SEMANTIC invariants and the scale-shape of the plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.registry import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_gopher_probe_creates_both_classes(spark, sf_dir):
    rows = REGISTRY["filter-repetition-gopher"].spark(spark, sf_dir).collect()
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert kept and dropped, "thresholds must split the corpus"
    # every spam-probed doc (doc_id % 8 == 0) has duplicate 3-grams
    probed = [r for r in rows if r["doc_id"] % 8 == 0]
    assert probed and all(r["dup3_ratio"] > 0 for r in probed)
    # the repeated phrase pushes dup3 over the gate for short docs at least
    assert any(not r["keep"] and r["dup3_ratio"] > 0.10 for r in probed)


def test_unigram_logprob_orders_rare_below_common(spark, sf_dir):
    """A doc of common words must score higher (closer to 0) than the
    corpus-wide average doc built of rarer words."""
    df = REGISTRY["udf-unigram-logprob"].spark(spark, sf_dir)
    rows = df.collect()
    assert all(r["avg_logprob"] < 0 for r in rows)
    # scores vary (not a constant column) and are bounded sanely
    scores = sorted(r["avg_logprob"] for r in rows)
    assert scores[0] < scores[-1]
    assert scores[0] > -25


def test_bm25_ranked_output_is_deterministic_topk(spark, sf_dir):
    a = REGISTRY["text-bm25-rank"].spark(spark, sf_dir).collect()
    b = REGISTRY["text-bm25-rank"].spark(spark, sf_dir).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    scores = [r["bm25"] for r in a]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_watermark_late_counts_match_bruteforce(spark, sf_dir):
    """The two-pass running max must equal the naive global-window compute
    (small fixture: brute force in a single partition)."""
    from ai_knowledge_etl_spark.sources.catalog import load_table

    out = {
        r["event_type"]: (r["n_events"], r["n_late"])
        for r in REGISTRY["stream-late-data-watermark"]
        .spark(spark, sf_dir)
        .collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "ts")
        .collect()
    )
    ev.sort(key=lambda r: r["event_id"])
    seen_max, brute = None, {}
    for r in ev:
        n, late = brute.get(r["event_type"], (0, 0))
        is_late = seen_max is not None and r["ts"] < seen_max - 600_000_000_000
        brute[r["event_type"]] = (n + 1, late + (1 if is_late else 0))
        seen_max = r["ts"] if seen_max is None or r["ts"] > seen_max else seen_max
    assert out == brute


def test_watermark_running_max_has_no_global_window(spark, sf_dir):
    plan = _plan(REGISTRY["stream-late-data-watermark"].spark(spark, sf_dir))
    assert "SinglePartition" not in plan
    assert "BroadcastExchange" in plan  # prefix maxes arrive broadcast


def test_running_max_two_pass_partitioning_invariant(spark):
    """Same answer at 1, 3, and 16 partitions (the two-pass scheme must not
    depend on where range boundaries land)."""
    from ai_knowledge_etl_spark.operators.ids import running_max_two_pass

    rows = [(i, (7 * i) % 101) for i in range(400)]
    df = spark.createDataFrame(rows, "k int, v int")
    expected = None
    for n in (1, 3, 16):
        got = {
            r["k"]: r["rm"]
            for r in running_max_two_pass(
                df, ["k"], "v", out_col="rm", num_partitions=n
            ).collect()
        }
        if expected is None:
            expected = got
        assert got == expected
    # spot-check exclusive semantics: first row has no prior observation
    assert expected[0] is None
    assert expected[1] == 0  # v(0) = 0


def test_jaccard_neighbors_bounds_and_symmetry(spark, sf_dir):
    rows = REGISTRY["graph-jaccard-neighbors"].spark(spark, sf_dir).collect()
    assert rows, "link-prediction output must be non-empty on the fixture"
    for r in rows:
        assert r["u"] < r["v"]  # canonical pair ordering, no mirrored dupes
        assert r["common"] >= 2
        assert 0.0 < r["jaccard"] <= 1.0


def test_degree_distribution_conserves_nodes_and_edges(spark, sf_dir):
    rows = REGISTRY["graph-degree-distribution"].spark(spark, sf_dir).collect()
    total_deg = sum(r["degree"] * r["n_nodes"] for r in rows)
    # undirected handshake: sum of degrees = 2 * |edges|
    assert total_deg % 2 == 0


def test_bm25_and_logprob_plans_have_no_python(spark, sf_dir):
    for name in ("text-bm25-rank", "udf-unigram-logprob",
                 "filter-repetition-gopher"):
        plan = _plan(REGISTRY[name].spark(spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_bm25_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(REGISTRY["text-bm25-rank"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
