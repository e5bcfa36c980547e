"""WARC (Web ARChive) record scanning over binary columns — the
Common-Crawl-shaped source a web-scale training pipeline ingests.

The reference consumes live pages (commands/extract.md:445-559); at
100 TB the same content arrives as WARC files: many records concatenated
per file, each `WARC/1.0` + headers + Content-Length-delimited payload.
Spark shape: `binaryFile` scan (one row per WARC file) → Arrow-batched
mapInPandas parser (1 file row → N record rows). Parsing is streaming and
single-pass per file; memory is bounded by one record, not one file, in a
production reader (here whole files ride the binary column, which
`maxPartitionBytes` already bounds).

Resync-on-corruption: a damaged record (clobbered magic) must not kill
the file — the parser scans forward to the next `WARC/1.0` marker and
keeps going, counting skipped bytes (error-as-data, reference:
image-analyzer.md:224-240 discipline).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"WARC/1.0"
_HDR_END = b"\r\n\r\n"

RECORD_SCHEMA = (
    "file_id bigint, uri string, n_bytes int, head string, rec_offset int"
)


def iter_warc_records(
    raw: bytes,
) -> tuple[list[tuple[dict[str, str], bytes, int]], int]:
    """Single pass over one WARC file's bytes: the shared record walker.

    Returns ([(headers, payload_bytes, record_offset)], skipped) —
    `skipped` counts bytes not attributable to a well-formed record
    (corruption resync)."""
    out: list[tuple[dict[str, str], bytes, int]] = []
    pos, skipped = 0, 0
    n = len(raw)
    while pos < n:
        nxt = raw.find(MAGIC, pos)
        if nxt < 0:
            skipped += n - pos
            break
        skipped += nxt - pos
        hdr_end = raw.find(_HDR_END, nxt)
        if hdr_end < 0:
            skipped += n - nxt
            break
        headers: dict[str, str] = {}
        for line in raw[nxt + len(MAGIC) : hdr_end].split(b"\r\n"):
            if b":" in line:
                k, _, v = line.partition(b":")
                headers[k.strip().decode("utf-8", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            # header block without a usable length: resync after it
            skipped += hdr_end + len(_HDR_END) - nxt
            pos = hdr_end + len(_HDR_END)
            continue
        body_start = hdr_end + len(_HDR_END)
        payload = raw[body_start : body_start + length]
        out.append((headers, payload, nxt))
        pos = body_start + length
        # consume the well-formed record trailer so it isn't counted as
        # skipped/corrupt bytes
        if raw[pos : pos + len(_HDR_END)] == _HDR_END:
            pos += len(_HDR_END)
    return out, skipped


def parse_warc_bytes(raw: bytes) -> tuple[list[tuple[str, int, str, int]], int]:
    """Metadata view over `iter_warc_records`.

    Returns ([(uri, payload_len, payload_head, record_offset)], skipped)."""
    recs, skipped = iter_warc_records(raw)
    out = []
    for headers, payload, off in recs:
        # head = first 40 CHARACTERS of the decoded payload (not 40 raw
        # bytes): byte truncation of multibyte UTF-8 text would emit
        # replacement chars and diverge from any character-semantics
        # consumer (the oracle's substring(text,1,40) included). Decoding
        # is bounded to 164 bytes — 40 4-byte code points plus one
        # possibly-split trailing char, which the [:40] slice discards.
        out.append(
            (
                headers.get("warc-target-uri", ""),
                len(payload),
                payload[:164].decode("utf-8", "replace")[:40],
                off,
            )
        )
    return out, skipped


def scan_warc(
    files: DataFrame, id_col: str = "file_id", content_col: str = "content"
) -> DataFrame:
    """(file_id, content binary) → one row per parsed WARC record."""
    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(files.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fids, uris, lens, heads, offs = [], [], [], [], []
            for fid, blob in zip(pdf[id_col], pdf[content_col]):
                recs, _ = parse_warc_bytes(bytes(blob) if blob is not None else b"")
                for uri, ln, head, off in recs:
                    fids.append(fid)
                    uris.append(uri)
                    lens.append(ln)
                    heads.append(head)
                    offs.append(off)
            yield pd.DataFrame(
                {
                    "file_id": fids,
                    "uri": uris,
                    "n_bytes": lens,
                    "head": heads,
                    "rec_offset": offs,
                }
            )

    return files.select(id_col, content_col).mapInPandas(gen, RECORD_SCHEMA)


TEXT_SCHEMA = "uri string, text string"


def scan_warc_text(
    files: DataFrame, id_col: str = "file_id", content_col: str = "content"
) -> DataFrame:
    """(file_id, content binary) → (uri, text): the corpus-ingestion view —
    full decoded payload text per surviving record, corrupted records
    resync'd past. This is the entry stage of pipeline-warc-corpus; the
    metadata view (scan_warc) stays the cheap census."""
    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(files.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris, texts = [], []
            for blob in pdf[content_col]:
                recs, _ = iter_warc_records(
                    bytes(blob) if blob is not None else b""
                )
                for headers, payload, _off in recs:
                    uris.append(headers.get("warc-target-uri", ""))
                    texts.append(payload.decode("utf-8", "replace"))
            yield pd.DataFrame({"uri": uris, "text": texts})

    return files.select(id_col, content_col).mapInPandas(gen, TEXT_SCHEMA)
