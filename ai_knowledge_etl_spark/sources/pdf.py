"""PDF scan (reference: DESIGN.md:686-697, config/limits.yaml:91-92 — read
≤15 pages, summarize beyond). Parser import-gated: pypdf when available,
deterministic byte-window fake otherwise (keeps plumbing and page-cap
semantics testable without the library)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PDF_PAGE_CAP = 15


def _extract_pages(raw: bytes, cap: int) -> tuple[list[str], str | None]:
    try:
        import io

        from pypdf import PdfReader  # type: ignore

        reader = PdfReader(io.BytesIO(raw))
        return [p.extract_text() or "" for p in reader.pages[:cap]], None
    except ImportError:
        if not raw.startswith(b"%PDF"):
            return [], "E004: not a PDF (bad magic)"
        # deterministic fake: 1 'page' per 1 KiB window, capped
        n = max(1, min(len(raw) // 1024, cap))
        return [f"[pdf page {i + 1}: {len(raw)} bytes]" for i in range(n)], None


def pdf_pages(
    binaries: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    cap: int = PDF_PAGE_CAP,
) -> DataFrame:
    """binary PDFs → (path, page_no, page_text, error) rows, page-capped.
    Errors are data (unreadable files never kill the scan)."""
    schema = f"{path_col} string, page_no int, page_text string, error string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "page_no": [], "page_text": [], "error": []}
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                raw = bytes(blob) if blob is not None else b""
                pages, err = _extract_pages(raw, cap)
                if err:
                    out["path"].append(path)
                    out["page_no"].append(0)
                    out["page_text"].append(None)
                    out["error"].append(err)
                    continue
                for i, text in enumerate(pages):
                    out["path"].append(path)
                    out["page_no"].append(i + 1)
                    out["page_text"].append(text)
                    out["error"].append(None)
            yield pd.DataFrame(out)

    return binaries.select(path_col, content_col).mapInPandas(gen, schema)
