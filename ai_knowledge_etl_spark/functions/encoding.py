"""Charset detection over binary columns (ingest hygiene for web/WARC
corpora: fetched bytes arrive with no trustworthy charset header, and a
wrong decode silently corrupts every downstream dedup fingerprint and
chunk boundary).

Detection order is the practical sniff every real ingester runs:
  1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — authoritative when present;
  2. strict UTF-8 trial decode — pure-ASCII bytes report 'ascii',
     multibyte-but-valid report 'utf-8';
  3. latin-1 fallback — any byte sequence decodes, so this is the
     terminal bucket (what browsers historically did).

The kernel is an Arrow-batched mapInPandas over raw bytes — Python only
sees each partition's batches, no shuffle, as parallel as the scan.
Full chardet-style statistical models slot into the same seam.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-bom"),
    (b"\xff\xfe", "utf-16le"),
    (b"\xfe\xff", "utf-16be"),
)


def sniff_bytes(raw: bytes | None) -> str:
    """Charset label for one byte string (None-safe; '' → 'empty')."""
    if raw is None or len(raw) == 0:
        return "empty"
    for bom, label in _BOMS:
        if raw.startswith(bom):
            return label
    try:
        raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return "latin-1"
    return "ascii" if max(raw) < 0x80 else "utf-8"


def detect_encoding(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """(id, content binary) → (id, detected string, n_bytes long)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "detected": pdf[content_col].map(sniff_bytes),
                    "n_bytes": pdf[content_col].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        gen, f"{id_col} long, detected string, n_bytes long"
    )
