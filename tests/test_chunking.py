"""Property tests for the production RAG chunker (SURVEY §7 watch-list #3:
overlap off-by-ones and code-block atomicity are the hard correctness
spots). Pure-Python properties run via hypothesis; the Spark surface gets a
smoke + invariant pass over the fixture corpus."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_knowledge_etl_spark import config
from ai_knowledge_etl_spark.operators.chunking import chunk_document

WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "spark", "join", "x y z"]),
    min_size=0,
    max_size=400,
)


def _doc(words: list[str], with_code: bool, with_headings: bool) -> str:
    text = " ".join(words)
    parts = []
    if with_headings:
        parts.append("# Title\n")
    parts.append(text[: len(text) // 2])
    if with_code:
        parts.append("\n```\ncode line one\ncode line two\n```\n")
    if with_headings:
        parts.append("\n## Section\n")
    parts.append(text[len(text) // 2 :])
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(WORDS, st.booleans(), st.booleans())
def test_chunks_cover_text(words, with_code, with_headings):
    """Every chunk is drawn from the doc and all content chars survive:
    stripping the overlap prefixes and concatenating reproduces a
    supersequence of the original's non-whitespace characters."""
    text = _doc(words, with_code, with_headings)
    chunks = chunk_document(text)
    if not text.strip():
        assert chunks == []
        return
    assert chunks, "non-empty doc must chunk"
    # size bounds: every chunk ≤ max + overlap slack unless it is an atomic
    # code block (never split)
    for c in chunks:
        if "```" in c:
            continue
        assert len(c) <= config.RAG_CHUNK_MAX + config.RAG_CHUNK_OVERLAP + 1

    joined = "".join(chunks)
    # no content loss: multiset of non-space chars of original ⊆ joined
    orig = sorted(text.replace(" ", "").replace("\n", ""))
    got = sorted(joined.replace(" ", "").replace("\n", ""))
    i = j = 0
    while i < len(orig) and j < len(got):
        if orig[i] == got[j]:
            i += 1
        j += 1
    assert i == len(orig), "content chars lost in chunking"


@settings(max_examples=150, deadline=None)
@given(WORDS)
def test_code_blocks_atomic(words):
    """A fenced code block never splits across chunks
    (reference: output-transformer.md:301-307)."""
    text = _doc(words, with_code=True, with_headings=True)
    for c in chunk_document(text):
        assert c.count("```") % 2 == 0, f"split code fence in chunk: {c!r}"


def test_cap_respected():
    text = "word " * 50_000
    chunks = chunk_document(text)
    assert len(chunks) <= config.RAG_CHUNKS_PER_FILE_CAP


def test_spark_surface(spark, sf_dir):
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators.chunking import rag_chunks_smart
    from ai_knowledge_etl_spark.sources import synthetic as syn
    from ai_knowledge_etl_spark.sources.catalog import load_table

    probed = (
        load_table(spark, sf_dir, "documents")
        .limit(50)
        .select("doc_id", F.expr(syn.MD_TEXT_EXPR).alias("text"))
    )
    out = rag_chunks_smart(probed, "doc_id", "text")
    rows = out.collect()
    assert len(rows) >= 50  # every doc yields at least one chunk
    assert out.columns == ["doc_id", "chunk_idx", "chunk"]
    # chunk_idx dense from 0 per doc
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_idx"])
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))
