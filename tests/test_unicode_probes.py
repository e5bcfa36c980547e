"""Multibyte/unicode probe coverage (round-3 verdict #1).

The fixture corpus is pure ASCII, so byte-vs-character confusions were
invisible to the differential oracle. `syn.uni_docs` injects +30M clone
documents carrying CJK (3-byte UTF-8), non-BMP emoji (4-byte; a surrogate
PAIR in UTF-16), and combining marks at string-boundary positions, and
URL_EXPR carries an IRI path segment on doc_id%17==12. These tests prove
the probes are real TRUE POSITIVES inside the oracled fixtures — not just
that queries stay green, but that the multibyte content actually reaches
the boundary cuts each operator makes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_knowledge_etl_spark.sources import synthetic as syn
from ai_knowledge_etl_spark.sources.catalog import load_table


def _udocs(spark, sf_dir):
    return syn.uni_docs(load_table(spark, sf_dir, "documents"))


def _has_non_ascii(col):
    # any codepoint above 0x7F → the regex class below matches
    return F.col(col).rlike("[^\\x00-\\x7F]")


def test_uni_corpus_contains_all_probe_classes(spark, sf_dir):
    clones = _udocs(spark, sf_dir).where(
        F.col("doc_id") >= syn.UNI_CLONE_OFFSET
    )
    n = clones.count()
    assert n > 0
    # every clone is non-ASCII
    assert clones.where(~_has_non_ascii("text")).count() == 0
    # all three decoration classes present: CJK, non-BMP emoji (outside the
    # BMP → not representable in one UTF-16 unit), combining mark U+0301
    assert clones.where(F.col("text").rlike("漢字")).count() > 0
    assert clones.where(F.col("text").contains("🚀")).count() > 0
    assert clones.where(F.col("text").contains("́")).count() > 0


def test_uni_clone_n_chars_counts_codepoints(spark, sf_dir):
    """n_chars must be the codepoint count of the decorated text — a
    byte-based recount would overshoot on every clone."""
    bad = (
        _udocs(spark, sf_dir)
        .where(F.col("doc_id") >= syn.UNI_CLONE_OFFSET)
        .where(F.col("n_chars") != F.length("text"))
        .count()
    )
    assert bad == 0


def test_warc_head_cuts_on_codepoint_boundary(spark, sf_dir):
    """The %3==1 clones place chars 39-41 as '🚀🌍字': the WARC parser's
    40-char head must end exactly ON the 🌍 codepoint — any byte-window
    truncation would emit U+FFFD or cut the emoji in half."""
    from ai_knowledge_etl_spark.registry.sources_sinks import warc_pack_files
    from ai_knowledge_etl_spark.sources import warc

    docs = _udocs(spark, sf_dir)
    heads = warc.scan_warc(warc_pack_files(docs, syn.url_col()))
    boundary = heads.where(F.col("head").endswith("🌍"))
    assert boundary.count() > 0
    assert heads.where(F.col("head").contains("�")).count() == 0
    # heads are 40 CHARS even where that is >40 bytes
    assert (
        heads.where(_has_non_ascii("head"))
        .where(F.length("head") > 40)
        .count()
        == 0
    )


def test_url_slug_handles_iri_path(spark, sf_dir):
    """doc_id%17==12 URLs carry '/文档ページ🚀': the slug must replace each
    multibyte CHAR with one underscore (a UTF-16-unit replace would emit
    two for the non-BMP 🚀) and cap at 50 chars."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    out = REGISTRY["project-url-slug"].spark(spark, sf_dir)
    rows = out.where("doc_id % 17 = 12")
    assert rows.count() > 0
    # '/文档ページ🚀/' is 8 chars (2 slashes + 5 CJK/kana + 1 emoji) →
    # exactly 8 consecutive underscores; a UTF-16-unit replace would make
    # 9 (🚀 is a surrogate pair), a byte-level one 17
    assert rows.where(F.col("slug").contains("_" * 8)).count() == rows.count()
    assert rows.where(F.col("slug").contains("_" * 9)).count() == 0
    assert out.where(F.length("slug") > 50).count() == 0


def test_substring_span_windows_cover_multibyte(spark, sf_dir):
    """The substring census tokenizes clone text whose tokens are CJK /
    emoji words; the census must produce windows for every clone doc."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    out = REGISTRY["dedup-substring-span"].spark(spark, sf_dir)
    clones = out.where(F.col("doc_id") >= syn.UNI_CLONE_OFFSET)
    assert clones.count() > 0
    assert clones.where("n_windows <= 0").count() == 0


def test_smart_chunker_overlap_on_multibyte(spark, sf_dir):
    """The Python (mapInPandas) RAG chunker accumulates by len() — chunk
    lengths and the 100-char overlap must be codepoint-true for clone docs
    whose heads carry multibyte text."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    out = REGISTRY["udtf-chunk-rag-smart-invariants"].spark(spark, sf_dir)
    clones = out.where(F.col("doc_id") >= syn.UNI_CLONE_OFFSET)
    assert clones.count() > 0
    bad = clones.where(
        ~F.col("idx_contiguous") | ~F.col("chunks_nonempty") | ~F.col("overlap_ok")
    )
    assert bad.count() == 0


def test_each_preset_hits_its_planted_bilingual_probes(spark, sf_dir):
    """TOPIC_PRESETS (the reference's curated bilingual pattern catalog,
    skills/relevance-scorer/references/patterns.md) must each match their
    planted probe docs — and the 中文 alternations must be the matching
    branch for at least one term per preset, so the CJK side of each
    pattern is load-bearing, not decoration."""
    from ai_knowledge_etl_spark import config

    docs = syn.preset_docs(load_table(spark, sf_dir, "documents"))
    keys = list(config.TOPIC_PRESETS)
    assert len(keys) == len(syn.PRESET_SNIPPETS) == 8
    for i, key in enumerate(keys):
        pat = config.TOPIC_PRESETS[key]
        planted = docs.where(F.col("doc_id") % 8 == i)
        n_planted = planted.count()
        assert n_planted > 0
        # every planted doc matches its own preset
        n_hit = planted.where(
            F.size(
                F.regexp_extract_all(F.lower("text"), F.lit(pat), F.lit(1))
            )
            > 0
        ).count()
        assert n_hit == n_planted, f"{key}: {n_hit}/{n_planted} probes hit"
        # the snippet's CJK term alone matches the pattern (the bilingual
        # half is exercised, independent of the English terms)
        import re

        cjk_terms = re.findall(r"[一-鿿]+", syn.PRESET_SNIPPETS[i])
        assert cjk_terms, f"{key}: snippet carries no CJK term"
        assert any(
            re.search(pat, t) for t in cjk_terms
        ), f"{key}: no CJK term of its snippet matches the preset"
