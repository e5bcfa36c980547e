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


class DemoKernel:
    """Deterministic in-package ModelKernel — the CLI's `--with-images`
    kernel knob resolves to this by default name (see resolve_kernel).
    It is a STAND-IN for a batched inference client, not a model: every
    method is a pure function of its batch, so the composed CLI path
    (binaryFile scan → Arrow batch → kernel → error-as-data → parquet
    sink) is testable end-to-end in-container. Being package-level makes
    it importable on executors through the same addPyFile shipping as
    the rest of the engine — exactly where a user's client wrapper would
    live. It upholds the anti-fabrication contract: undecodable bytes
    yield E003 rows, never a made-up description."""

    def summarize_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        texts = pdf["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "summary": "MODEL: " + texts.str.slice(0, 200),
                "headline": texts.str.split().str[:8].str.join(" "),
                "n_words": texts.str.split().str.len().astype("int32"),
            }
        )

    def classify_image_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        cats = [
            IM.IMAGE_CATEGORIES[
                int(hashlib.md5(bytes(b).hex().upper().encode()).hexdigest()[:2], 16)
                % len(IM.IMAGE_CATEGORIES)
            ]
            for b in pdf["content"]
        ]
        return pd.DataFrame({"path": pdf["path"], "category": cats})

    def describe_image_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        desc, err = [], []
        for b in pdf["content"]:
            raw = bytes(b)
            fmt = next(
                (
                    f
                    for f, m in IM.MAGIC.items()
                    if raw[:4].hex().upper().startswith(m[:8])
                ),
                None,
            )
            if fmt is None:
                desc.append(None)
                err.append("E003: unreadable image (bad magic)")
            else:
                desc.append(f"MODEL: {fmt} image, {len(raw)} bytes")
                err.append(None)
        return pd.DataFrame(
            {"path": pdf["path"], "description": desc, "error": err}
        )


def demo_kernel() -> ModelKernel:
    """Factory for the demo kernel (the env knob points at factories so a
    real client can read its endpoint config at construction time)."""
    return DemoKernel()


def resolve_kernel(spec: str | None) -> ModelKernel | None:
    """Resolve the CLI kernel knob (env SPARK_GRAFT_MODEL_KERNEL) to a
    ModelKernel: 'package.module:attr' where attr is a ModelKernel or a
    zero-arg factory returning one; empty/None → None (extractive
    fallback). The module must be importable on executors — ship a user
    kernel inside a package the session's addPyFile covers (DemoKernel
    demonstrates the shape)."""
    if not spec:
        return None
    import importlib

    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(
            f"kernel spec {spec!r} must be 'module:attr' (factory or instance)"
        )
    obj = getattr(importlib.import_module(mod_name), attr)
    if isinstance(obj, type):  # a class: instantiate (classes satisfy the
        kernel = obj()  # runtime Protocol check via their unbound methods)
    elif isinstance(obj, ModelKernel):
        kernel = obj
    elif callable(obj):  # zero-arg factory
        kernel = obj()
    else:
        kernel = obj
    if not isinstance(kernel, ModelKernel):
        raise TypeError(f"{spec!r} did not resolve to a ModelKernel")
    return kernel


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
