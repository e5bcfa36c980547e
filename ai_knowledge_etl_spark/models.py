"""Model-kernel seam for LLM/vision-backed operators (SURVEY §7 Phase 3).

The reference's kernel for summarize / classify-image / describe-image is
an agentic LLM call (reference: DESIGN.md:1271-1314,
agents/image-analyzer.md:113-240). This repo's registered queries run
deterministic extractive fallbacks so they stay oracle-checkable — but the
PRODUCTION seam is here, and it is the same seam for both modes:

- `kernel=None` → the extractive fallback: pure JVM column expressions,
  whole-stage codegen, zero Python in the plan. This is what the registry
  and the differential oracle exercise.
- `kernel=<ModelKernel>` → the model path: the kernel's batched
  pandas→pandas method is applied via Arrow-batched `mapInPandas` with the
  SAME output schema. A real deployment implements ModelKernel with a
  batched inference client (one RPC per Arrow batch, not per row); tests
  swap in a deterministic fake to prove the seam without a model in the
  container.

Both paths return identical schemas, so downstream operators cannot tell
which kernel produced a row — swapping a model in changes no query code.

Scale notes: mapInPandas streams Arrow record batches through the Python
worker — tune `spark.sql.execution.arrow.maxRecordsPerBatch` to the
model's optimal batch size. Per-row error handling is data, not
exceptions (error column), matching the anti-fabrication discipline of
multimodal/images.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Protocol, runtime_checkable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.multimodal import images as IM

SUMMARY_SCHEMA = "doc_id bigint, summary string, headline string, n_words int"
CLASSIFY_SCHEMA = "path string, category string"
DESCRIBE_SCHEMA = "path string, description string, error string"


@runtime_checkable
class ModelKernel(Protocol):
    """Batched model inference contract. Each method takes ONE pandas
    batch (an Arrow record batch's worth of rows) and returns a pandas
    DataFrame with exactly the documented columns. Implementations must be
    pure (same input → same output) for reproducible pipelines; a serving
    client satisfies this by pinning model + temperature 0."""

    def summarize_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """(doc_id, text) → (doc_id, summary, headline, n_words)."""
        ...

    def classify_image_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """(path, content) → (path, category); category from
        IM.IMAGE_CATEGORIES."""
        ...

    def describe_image_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """(path, content) → (path, description, error); never fabricate —
        undecodable bytes yield an error record, not a description."""
        ...


def summarize_pages(
    docs: DataFrame, kernel: ModelKernel | None = None
) -> DataFrame:
    """Page summarization (reference: DESIGN.md:1271-1314). Input needs
    (doc_id, text); output follows SUMMARY_SCHEMA under either kernel."""
    if kernel is None:
        words = F.split("text", " ")
        return docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.substring("text", 1, 200).alias("summary"),
            F.concat_ws(" ", F.slice(words, 1, 8)).alias("headline"),
            F.size(words).cast("int").alias("n_words"),
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield kernel.summarize_batch(pdf)

    return docs.select("doc_id", "text").mapInPandas(gen, SUMMARY_SCHEMA)


def classify_images(
    images: DataFrame, kernel: ModelKernel | None = None
) -> DataFrame:
    """8-class image categorization over a binary column (reference:
    DESIGN.md:1133-1141). Invalid-magic rows are filtered JVM-side under
    BOTH kernels — bytes that can't be an image never reach the model."""
    valid = images.where(IM.is_valid_image("content"))
    if kernel is None:
        return valid.select(
            "path", IM.classify_image_stub("content").alias("category")
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield kernel.classify_image_batch(pdf)

    return valid.select("path", "content").mapInPandas(gen, CLASSIFY_SCHEMA)


def describe_images(
    images: DataFrame, kernel: ModelKernel | None = None
) -> DataFrame:
    """Anti-fabrication describe (reference: image-analyzer.md:193-240):
    valid bytes → description, invalid bytes → E003 error record — under
    the model kernel too (the kernel sees raw bytes and must uphold the
    same contract; the fake in tests and the structural stub both do)."""
    if kernel is None:
        return IM.describe_images_stub(images)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield kernel.describe_image_batch(pdf)

    return images.select("path", "content").mapInPandas(gen, DESCRIBE_SCHEMA)
