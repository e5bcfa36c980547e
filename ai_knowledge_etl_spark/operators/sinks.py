"""Sinks (SURVEY §2.A sink-markdown-pages / sink-pipe-formats).

The canonical sink is parquet (columnar, splittable — the 100 TB path);
the reference's one-file-per-page layout (pages/{id}_{slug}.md + .summary
sidecar, agents/extractor.md:376-384) is re-expressed as *columns*
(path, content, summary) so it stays a DataFrame until the final local
export. `export_markdown_pages` materializes actual files for local use —
explicitly not the scale path.

Pipe formats (reference: agents/output-transformer.md:140-370): rag and
json are data-shaped (DataFrames of records); skill/prompt/docs are
templated documents rendered from aggregates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config


def markdown_page_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    slug_col: str = "source",
) -> DataFrame:
    """(path, content, summary) rows — the page + sidecar as columns."""
    path = F.concat(
        F.lit("pages/"),
        F.lpad(F.col(id_col).cast("string"), 3, "0"),
        F.lit("_"),
        F.col(slug_col),
        F.lit(".md"),
    )
    return docs.select(
        path.alias("path"),
        F.col(text_col).alias("content"),
        F.substring(text_col, 1, config.SUMMARY_MAX_CHARS).alias("summary"),
    )


def write_pages_parquet(pages: DataFrame, out_dir: str) -> None:
    """Canonical sink: parquet, summary as a pruned-readable column
    (the reference's read-sidecar-not-page optimization becomes parquet
    column pruning for free — SURVEY §4)."""
    pages.write.mode("overwrite").parquet(out_dir)


def export_markdown_pages(pages: DataFrame, out_dir: str) -> int:
    """Local file export (small outputs only): one .md + .summary per page.
    Driver-side by design — a per-page file layout is not a 100 TB sink."""
    rows = pages.collect()
    for r in rows:
        full = os.path.join(out_dir, r["path"])
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "w") as f:
            f.write(r["content"])
        with open(full.replace(".md", ".summary"), "w") as f:
            f.write(r["summary"])
    return len(rows)


def pipe_json(docs: DataFrame) -> DataFrame:
    """--pipe=json: one JSON record per doc, schema-stable key order."""
    return docs.select(
        F.concat(
            F.lit('{"doc_id":'), F.col("doc_id").cast("string"),
            F.lit(',"source":"'), F.col("source"),
            F.lit('","n_chars":'), F.col("n_chars").cast("string"),
            F.lit("}"),
        ).alias("record")
    )


def pipe_docs(index_lines: DataFrame, title: str) -> DataFrame:
    """--pipe=docs: a rendered document from aggregate lines (driver-small)."""
    body = index_lines.agg(
        F.concat_ws("\n", F.sort_array(F.collect_list("line"))).alias("body")
    )
    return body.select(
        F.concat(F.lit(f"# {title}\n\n"), F.col("body")).alias("doc")
    )
