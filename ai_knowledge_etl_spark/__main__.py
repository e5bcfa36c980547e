"""Command-line surface — the engine's twin of the reference's entry point

    /knowledge-etl:extract <source> [--with-depth=N] [--topic=REGEX]
        [--max-pages=N] [--pipe=FORMAT] [--output-dir=DIR] [--engine=E]
        [--with-images] [--compact-cph]

(reference: commands/extract.md:14-42, README.md:71-83). Every flag routes
to pipeline code that already has a green CORRECTNESS twin — this module is
composition + argument validation, no new query semantics:

    source kinds   sources/detect.resolve (scan-input-detect /
                   scan-directory / scan-glob), sources/detect.scan_git_repo
                   (scan-git-repo), sources/pdf.pdf_pages (scan-pdf)
    --with-depth   pipeline.crawl (stream-crawl-frontier, BFS waves)
    --topic        config.TOPIC_PRESETS (score-page-preset) or a raw regex
    --max-pages    pipeline.extract top-k cap (limit-caps)
    --pipe         pipeline.extract output formats (sink-pipe-*, all six)
    --engine       sources/web fetcher seam + urls.security_route
                   (filter-security-route)
    --with-images  models.classify_images / describe_images
                   (udf-classify-image, udf-describe-image)

Offline posture: this container has no network, so every engine maps onto
the deterministic fetch analog (`sources/web.demo_fetcher` for http(s)
sources, a local file reader for paths — both run through the SAME
fetch_pipeline lifecycle: security route → politeness → retry → strip →
obstacle). On a deployment with network access the `--engine` flag selects
a real fetcher callable through the same seam (see _fetcher_for).

Usage:
    python -m ai_knowledge_etl_spark extract ./docs/ --topic spark --pipe rag
    python -m ai_knowledge_etl_spark extract 'https://docs.example.com/' \
        --with-depth 2 --max-pages 50 --pipe docs --output-dir ./out
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config

PIPE_FORMATS = ("skill", "plugin", "prompt", "rag", "docs", "json")
ENGINES = ("auto", "playwright", "jina", "trafilatura")
DEFAULT_OUTPUT_DIR = ".knowledge-etl"
IMAGE_GLOB = "{*.png,*.jpg,*.jpeg,*.gif,*.webp,*.bmp}"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m ai_knowledge_etl_spark",
        description="PySpark-native knowledge-ETL engine",
    )
    sub = p.add_subparsers(dest="command", required=True)
    ex = sub.add_parser(
        "extract",
        help="extract any content source to scored markdown pages "
        "(+ optional crawl and --pipe transform)",
    )
    ex.add_argument(
        "source",
        help="URL, image path, glob pattern, PDF path, directory, or git URL",
    )
    ex.add_argument(
        "--with-depth",
        type=int,
        default=0,
        metavar="N",
        help="enable crawling with the given depth (1-3); URL sources only",
    )
    ex.add_argument(
        "--topic",
        default=None,
        metavar="REGEX",
        help="topic regex for relevance scoring, or a preset name "
        f"({', '.join(config.TOPIC_PRESETS)})",
    )
    ex.add_argument(
        "--max-pages",
        type=int,
        default=config.MAX_PAGES_DEFAULT,
        metavar="N",
        help=f"maximum pages to process (default {config.MAX_PAGES_DEFAULT})",
    )
    ex.add_argument(
        "--pipe",
        choices=PIPE_FORMATS,
        default=None,
        help="transform output to this format",
    )
    ex.add_argument(
        "--output-dir",
        default=DEFAULT_OUTPUT_DIR,
        metavar="DIR",
        help=f"output directory (default {DEFAULT_OUTPUT_DIR})",
    )
    ex.add_argument(
        "--engine",
        choices=ENGINES,
        default="auto",
        help="extraction engine; 'auto' security-routes per URL "
        "(config/security.yaml rules)",
    )
    ex.add_argument(
        "--with-images",
        action="store_true",
        help="also scan + classify image files (directory/glob sources)",
    )
    ex.add_argument(
        "--compact-cph",
        action="store_true",
        help="compact progress output: only the final summary line",
    )
    return p


def resolve_topic(topic: str | None) -> str:
    """Preset name → catalog pattern; raw regex → wrapped with ONE capture
    group (the scoring-kernel contract); None → match-any fallback so an
    un-topic'd extract still scores deterministically."""
    if topic is None:
        return "(\\w+)"
    if topic in config.TOPIC_PRESETS:
        return config.TOPIC_PRESETS[topic]
    try:
        re.compile(topic)
    except re.error as e:
        raise SystemExit(f"--topic is not a valid regex: {e}")
    if topic.startswith("(") and topic.endswith(")"):
        return topic
    return f"({topic})"


def classify_source(source: str) -> str:
    """url | git | pdf | glob | directory | file — the driver-side form of
    sources/detect.classify_input, extended with the git/pdf dispatch the
    reference front door performs (commands/extract.md:347-356)."""
    low = source.lower()
    if low.endswith(".git") or low.startswith("git@"):
        return "git"
    if low.startswith(("http://", "https://")):
        return "url"
    if low.endswith(".pdf") and "*" not in source:
        return "pdf"
    if "*" in source:
        return "glob"
    if source.endswith("/") or os.path.isdir(source):
        return "directory"
    return "file"


def _file_fetcher(path: str) -> str:
    """The 'fetch' kernel for local sources: read the file as text. Runs on
    executors inside fetch_pipeline — the same lifecycle (route, politeness,
    retry, strip, obstacle) as a web fetch, so local and web sources share
    one code path. Paths arrive as binaryFile URIs (file:/...)."""
    if path.startswith("file:"):
        path = re.sub(r"^file:/*", "/", path)
    with open(path, "rb") as f:
        return f.read().decode("utf-8", errors="replace")


def _fetcher_for(engine: str, kind: str) -> Callable[[str], str]:
    """Engine flag → fetch callable. Local/file sources always read
    directly (the reference's security routing forces 'local' for
    non-web sources). Web engines all map to the deterministic offline
    analog in this container; on a networked deployment, drop a real
    requests/playwright/jina callable in here — fetch_pipeline's seam is
    Callable[[str], str]."""
    if kind != "url":
        return _file_fetcher
    from ai_knowledge_etl_spark.sources import web

    # auto / jina / trafilatura / playwright: one offline analog — the
    # engine CHOICE is recorded per URL by urls.security_route inside
    # fetch_pipeline; the fetch kernel is the deterministic analog.
    return web.demo_fetcher


def _source_urls(
    spark: SparkSession, source: str, kind: str, args, log
) -> DataFrame:
    """Resolve the source into a 1-column (url) frontier DataFrame."""
    from ai_knowledge_etl_spark.sources import detect

    if kind == "url":
        seeds = spark.createDataFrame([(source,)], "url string")
        if args.with_depth > 0:
            from ai_knowledge_etl_spark import pipeline

            log(f"crawling from {source} to depth {args.with_depth}")
            visited = pipeline.crawl(
                spark,
                seeds,
                _fetcher_for(args.engine, kind),
                resolve_topic(args.topic),
                max_depth=min(args.with_depth, config.MAX_DEPTH),
            )
            return visited.select("url")
        return seeds
    if kind == "git":
        repo_df = detect.scan_git_repo(
            spark, source, os.path.join(args.output_dir, "_git")
        )
        return repo_df.select(F.col("path").alias("url"))
    # glob / directory / file: binaryFile scan, paths only (content column
    # pruned — the file fetcher re-reads lazily on executors). Known-binary
    # extensions are excluded from the TEXT path: images go through
    # --with-images, PDFs through the pdf branch, archives are noise.
    binary_ext = r"(?i)\.(png|jpe?g|gif|webp|bmp|ico|pdf|zip|gz|tar|exe|so|bin|parquet)$"
    return (
        detect.resolve(spark, source)
        .select(F.col("path").alias("url"))
        .where(~F.col("url").rlike(binary_ext))
    )


def _export_pages(pages: DataFrame, out_dir: str) -> int:
    """Markdown page files + .summary sidecars (small outputs; the
    scale sink is the parquet written next to it)."""
    from ai_knowledge_etl_spark.functions import urls as U
    from ai_knowledge_etl_spark.operators import sinks

    # slug truncates at 50 chars, so deep paths would collide — suffix an
    # md5 fragment of the full url to keep one file per page
    rows = pages.where(F.col("text").isNotNull()).select(
        F.concat(
            F.lit("pages/"), U.slug("url"), F.lit("_"),
            F.substring(F.md5(F.col("url")), 1, 8), F.lit(".md"),
        ).alias("path"),
        F.col("doc").alias("content"),
        F.substring("text", 1, config.SUMMARY_MAX_CHARS).alias("summary"),
    )
    return sinks.export_markdown_pages(rows, out_dir)


def _scan_images(spark: SparkSession, source: str, kind: str) -> DataFrame:
    base = source if kind in ("directory", "glob") else os.path.dirname(source)
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", IMAGE_GLOB)
        .load(base or ".")
    )


def run_extract(spark: SparkSession, args) -> dict:
    def log(msg: str) -> None:
        if not args.compact_cph:
            print(f"[extract] {msg}", file=sys.stderr)

    if not 0 <= args.with_depth <= config.MAX_DEPTH:
        raise SystemExit(
            f"--with-depth must be 0-{config.MAX_DEPTH}, got {args.with_depth}"
        )
    if args.max_pages < 1:
        raise SystemExit("--max-pages must be >= 1")

    kind = classify_source(args.source)
    if kind not in ("url", "git"):
        probe = args.source.split("*")[0] if kind == "glob" else args.source
        if not os.path.exists(probe.rstrip("/") or "/"):
            raise SystemExit(f"source does not exist: {args.source}")
    log(f"source kind: {kind}; engine: {args.engine}")

    out_dir = args.output_dir
    os.makedirs(out_dir, exist_ok=True)

    from ai_knowledge_etl_spark import pipeline

    if kind == "pdf":
        # PDF path: binary scan → page-capped text extraction; pages become
        # the frontier documents directly (no fetch lifecycle for binaries).
        from ai_knowledge_etl_spark.sources import pdf as PDF

        binaries = (
            spark.read.format("binaryFile").load(args.source)
        )
        pdf_pages = PDF.pdf_pages(binaries)
        pdf_pages.write.mode("overwrite").parquet(
            os.path.join(out_dir, "pdf_pages_parquet")
        )
        n = pdf_pages.count()
        log(f"extracted {n} pdf page rows")
        return {
            "source": args.source,
            "kind": kind,
            "pages": n,
            "out_dir": out_dir,
        }

    urls = _source_urls(spark, args.source, kind, args, log)
    result = pipeline.extract(
        spark,
        urls,
        topic=resolve_topic(args.topic),
        fetcher=_fetcher_for(args.engine, kind),
        max_pages=args.max_pages,
        pipe=args.pipe,
        interval_s=0.0 if kind != "url" else config.REQUEST_INTERVAL_SECONDS,
    )

    # sinks: parquet (the scale sink), markdown pages + INDEX + REPORT
    # (the reference's file layout, driver-side small outputs)
    from ai_knowledge_etl_spark.operators import sinks

    sinks.write_pages_parquet(
        result.pages, os.path.join(out_dir, "pages_parquet")
    )
    n_pages = _export_pages(result.pages, out_dir)
    log(f"wrote {n_pages} markdown pages")

    index_lines = [r["line"] for r in result.index.orderBy("source").collect()]
    with open(os.path.join(out_dir, "INDEX.md"), "w") as f:
        f.write("# INDEX\n" + "\n".join(index_lines) + "\n")
    report_rows = result.report.collect()
    with open(os.path.join(out_dir, "REPORT.md"), "w") as f:
        f.write("# REPORT\n")
        for r in report_rows:
            f.write(f"- {r['stars']} ({r['relevance']}) {r['url']}\n")
    log(f"INDEX.md ({len(index_lines)} sources), REPORT.md "
        f"({len(report_rows)} rows)")

    if args.pipe:
        # distributed JSONL write — the pipe output is the piece that can
        # be corpus-sized, so it never routes through the driver
        pipe_dir = os.path.join(out_dir, f"output_{args.pipe}")
        result.output.write.mode("overwrite").json(pipe_dir)
        log(f"pipe={args.pipe} output -> {pipe_dir}")

    n_images = None
    if args.with_images:
        if kind in ("directory", "glob", "file"):
            from ai_knowledge_etl_spark import models

            # Kernel knob (round-7 verdict #3): SPARK_GRAFT_MODEL_KERNEL
            # = 'module:attr' swaps a batched vision ModelKernel into the
            # SAME composed path (binaryFile scan → Arrow mapInPandas →
            # error-as-data → parquet sink); unset → the extractive
            # stubs. models.demo_kernel is the in-package demo target.
            kernel = models.resolve_kernel(
                os.environ.get("SPARK_GRAFT_MODEL_KERNEL")
            )
            if kernel is not None:
                log(f"image kernel: {type(kernel).__name__}")
            imgs = _scan_images(spark, args.source, kind)
            # describe side drives the join: it carries EVERY scanned
            # file (error rows included — the anti-fabrication E003
            # records), while classify only emits valid-magic rows; the
            # old inner join silently dropped the error rows from the
            # sink, which is exactly the error-as-data contract breach
            # the composed path exists to prevent
            classified = models.describe_images(
                imgs.select("path", "content"), kernel=kernel
            ).join(
                models.classify_images(
                    imgs.select("path", "content"), kernel=kernel
                ),
                "path",
                "left",
            )
            classified.write.mode("overwrite").parquet(
                os.path.join(out_dir, "images_parquet")
            )
            n_images = classified.count()
            log(f"classified {n_images} images")
        else:
            log("--with-images: no local files to scan for a URL source "
                "in this offline build; skipped")

    stats = result.ir_stats.get if result.ir_stats is not None else {}
    summary = {
        "source": args.source,
        "kind": kind,
        "engine": args.engine,
        "pages": n_pages,
        "errors": stats.get("n_errors"),
        "total_chars": stats.get("total_chars"),
        "pipe": args.pipe,
        "images": n_images,
        "out_dir": out_dir,
    }
    return summary


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        from ai_knowledge_etl_spark.session import get_spark

        spark = get_spark("knowledge-etl-cli")
    try:
        if args.command == "extract":
            summary = run_extract(spark, args)
            print(json.dumps(summary))
            return 0
        raise SystemExit(f"unknown command {args.command!r}")
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
