"""End-to-end extract pipeline: the engine's `/knowledge-etl:extract`
equivalent, driven over the offline fetcher — single-wave extract and a
multi-wave crawl composed from the same pieces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import pipeline
from ai_knowledge_etl_spark.sources import synthetic as syn, web
from ai_knowledge_etl_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def frontier(spark, sf_dir):
    links = syn.with_links_columns(load_table(spark, sf_dir, "documents"))
    return links.orderBy("doc_id").limit(30).select("url")


def test_extract_end_to_end(spark, frontier):
    res = pipeline.extract(
        spark,
        frontier,
        topic="(spark|shuffle|join)",
        fetcher=web.demo_fetcher,
        max_pages=25,
        pipe="rag",
        interval_s=0.0,
    )
    pages = res.pages.collect()
    assert 0 < len(pages) <= 25
    # run metrics observed for free on the same pass (DESIGN.md:1092-1099)
    stats = res.ir_stats.get
    assert stats["n_pages"] == len(pages)
    assert stats["n_errors"] == sum(1 for r in pages if r["error"] is not None)
    assert stats["total_chars"] == sum(
        len(r["text"] or "") for r in pages
    )
    # scores bounded, stars attached, obstacles classified
    for r in pages:
        assert 0 <= r["relevance"] <= 10
        assert len(r["stars"]) == 5
        assert r["obstacle"] in ("NONE", "ANTI_SCRAPE", "LOGIN_REQUIRED",
                                 "CAPTCHA", "ANTI_BOT")
        if r["error"] is not None:
            assert r["text"] is None  # error-as-data, not fabricated text

    index = res.index.collect()
    assert index and all(r["line"].startswith("- [") for r in index)

    report = res.report.collect()
    assert len(report) <= 10
    rels = [r["relevance"] for r in report]
    assert rels == sorted(rels, reverse=True)

    out = res.output.collect()
    assert out and all(o["metadata"].startswith('{"source":"') for o in out)


def test_extract_pipe_json_and_bad_pipe(spark, frontier):
    res = pipeline.extract(
        spark, frontier, topic="(spark)", fetcher=web.demo_fetcher,
        pipe="json", interval_s=0.0,
    )
    rec = res.output.first()["record"]
    assert rec.startswith('{"url":"https://')
    with pytest.raises(ValueError, match="unknown pipe"):
        pipeline.extract(
            spark, frontier, topic="(spark)", fetcher=web.demo_fetcher,
            pipe="nope", interval_s=0.0,
        )


def test_crawl_composes_extract_waves(spark, sf_dir):
    """--with-depth: frontier loop + per-wave extract from the same pieces
    (reference: commands/extract.md:768-812)."""
    from ai_knowledge_etl_spark.functions import scoring, urls as U

    docs = load_table(spark, sf_dir, "documents")
    links = syn.with_links_columns(docs)
    visited = None
    wave = links.where("doc_id < 3").select("url")
    total = []
    for depth in range(2):
        res = pipeline.extract(
            spark, wave, topic="(spark|join)", fetcher=web.demo_fetcher,
            max_pages=10, interval_s=0.0,
        )
        got = res.pages.select("url").collect()
        total.extend(r["url"] for r in got)
        visited = wave if visited is None else visited.unionByName(wave)
        # discover next wave: links scored from fetched pages' doc ids
        wave = (
            links.where(f"doc_id % 50 < {3 + depth + 1}")
            .select("url")
            .join(visited, "url", "left_anti")
            .limit(10)
        )
    assert len(total) == len(set(total)) and len(total) > 0


def test_prepare_training_set_end_to_end(spark, sf_dir):
    """The composed training pipeline: quarantine drops shorts, near-dups
    collapse to canonicals, every survivor gets a split and a window
    span, and PII never survives."""
    from ai_knowledge_etl_spark import pipeline as P
    from ai_knowledge_etl_spark.functions import text as TX
    from ai_knowledge_etl_spark.registry.northstar import _dup_corpus

    docs = _dup_corpus(spark, sf_dir)  # contains planted exact/near dups
    out = P.prepare_training_set(docs).persist()

    n_in = docs.count()
    n_out = out.count()
    assert 0 < n_out < n_in  # quarantine + dedup actually dropped rows

    # planted exact duplicates (+200000) must not survive alongside their
    # originals
    survivors = {r["doc_id"] for r in out.select("doc_id").collect()}
    clones = {s for s in survivors if s >= 20000000}
    assert all(s - 20000000 not in survivors for s in clones)

    # every survivor has a split and a sane window span
    rows = out.select("split", "n_tok", "n_windows").collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(r["n_windows"] >= 1 for r in rows)

    # no unredacted PII patterns remain
    leaks = out.where(
        F.col("text").rlike(TX.PII_EMAIL) | F.col("text").rlike(TX.PII_CARD)
    ).count()
    assert leaks == 0
    out.unpersist()
