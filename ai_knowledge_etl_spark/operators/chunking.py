"""Chunking UDTFs (SURVEY §2.I udtf-chunk-text / udtf-chunk-rag).

Two tiers:

1. **SQL-expressible chunkers** (`fixed_chunks`, `rag_chunks_fixed`) —
   `sequence` + `posexplode` over computed split points, pure Catalyst, one
   row → N rows with zero Python. These are the oracle-testable twins and
   the scale path (whole-stage codegen, no JVM↔Python hop).

2. **`rag_chunks_smart`** — the reference's full RAG chunker semantics
   (reference: agents/output-transformer.md:301-330, config/limits.yaml:166-170):
   heading-aware boundaries, fenced code blocks atomic, 500-1000 char chunks
   with 100-char overlap, ≤50 chunks/doc. Order-dependent accumulation →
   Arrow-batched `mapInPandas` (vectorized transfer, per-row Python only
   inside the batch; parallelism = input partitions, no shuffle).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config


def fixed_chunks(
    df: DataFrame, id_col: str, text_col: str, chunk_chars: int = config.CHUNK_CHARS
) -> DataFrame:
    """1 row → ceil(len/chunk_chars) rows of fixed-size chunks
    (reference: agents/extractor.md:144-185 chunked read)."""
    n_minus_1 = (
        f"greatest(CAST(floor((length({text_col})-1)/{chunk_chars}.0) AS INT), 0)"
    )
    chunks = F.expr(
        f"transform(sequence(0, {n_minus_1}),"
        f" i -> substring({text_col}, i*{chunk_chars}+1, {chunk_chars}))"
    )
    return df.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).withColumn("chunk_idx", F.col("chunk_idx").cast("int"))


def rag_chunks_fixed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int = config.RAG_CHUNK_MAX,
    overlap: int = config.RAG_CHUNK_OVERLAP,
    cap: int = config.RAG_CHUNKS_PER_FILE_CAP,
) -> DataFrame:
    """Overlapping sliding chunks: stride = chunk - overlap, capped per doc
    (reference: config/limits.yaml:166-170)."""
    stride = chunk_chars - overlap
    n = (
        f"least(greatest(CAST(ceil((length({text_col})-{overlap})/{stride}.0) AS INT), 1), {cap})"
    )
    chunks = F.expr(
        f"transform(sequence(0, {n} - 1),"
        f" i -> substring({text_col}, i*{stride}+1, {chunk_chars}))"
    )
    return df.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).withColumn("chunk_idx", F.col("chunk_idx").cast("int"))


_FENCE_RE = re.compile(r"^```", re.M)
_BOUNDARY_RE = re.compile(r"(?m)(?=^#{1,6} )|\n\n")


def _segments(text: str) -> list[str]:
    """Split into atomic segments: fenced code blocks stay whole; prose
    splits at headings and blank lines."""
    out: list[str] = []
    pos = 0
    fences = [m.start() for m in _FENCE_RE.finditer(text)]
    # pair up fence markers: [open, close), close fence line included
    pairs = []
    for i in range(0, len(fences) - 1, 2):
        close_end = text.find("\n", fences[i + 1])
        close_end = len(text) if close_end == -1 else close_end + 1
        pairs.append((fences[i], close_end))
    for start, end in pairs:
        if start > pos:
            out.extend(s for s in _BOUNDARY_RE.split(text[pos:start]) if s and s.strip())
        out.append(text[start:end])
        pos = end
    if pos < len(text):
        out.extend(s for s in _BOUNDARY_RE.split(text[pos:]) if s and s.strip())
    return out


def chunk_document(
    text: str,
    min_chars: int = config.RAG_CHUNK_MIN,
    max_chars: int = config.RAG_CHUNK_MAX,
    overlap: int = config.RAG_CHUNK_OVERLAP,
    cap: int = config.RAG_CHUNKS_PER_FILE_CAP,
) -> list[str]:
    """Heading-aware accumulation: flush when adding a segment would exceed
    max_chars and we already hold >= min_chars; oversized atomic segments
    (code blocks) become their own chunk; each chunk after the first is
    prefixed with the previous chunk's last `overlap` chars."""
    chunks: list[str] = []
    buf = ""
    for seg in _segments(text):
        if len(buf) + len(seg) > max_chars and len(buf) >= min_chars:
            chunks.append(buf)
            buf = buf[-overlap:] if overlap else ""
        if len(seg) > max_chars and not buf:
            chunks.append(seg)  # atomic oversize (code block) — never split
            buf = seg[-overlap:] if overlap else ""
            continue
        buf = (buf + "\n" + seg) if buf else seg
    if buf and (not chunks or not chunks[-1].endswith(buf)):
        chunks.append(buf)
    return chunks[:cap]


def rag_chunks_smart(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """mapInPandas wrapper around `chunk_document` — the production RAG
    chunker. Not SQL-expressible (order-dependent accumulation), so the
    driver gate is rows-only; invariants are property-tested in
    tests/test_chunking.py."""
    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(df.sparkSession)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, chunk_idx int, chunk string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                for i, ch in enumerate(chunk_document(txt or "")):
                    ids.append(did)
                    idxs.append(i)
                    chunks.append(ch)
            yield pd.DataFrame(
                {id_col: ids, "chunk_idx": idxs, "chunk": chunks}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)
