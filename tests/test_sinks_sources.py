"""Sinks + input dispatch: parquet canonical sink, local markdown export,
docs pipe, directory resolution with excludes."""

from __future__ import annotations

import os

from ai_knowledge_etl_spark.operators import sinks
from ai_knowledge_etl_spark.sources import detect
from ai_knowledge_etl_spark.sources.catalog import load_table


def test_markdown_export_roundtrip(spark, sf_dir, tmp_path):
    pages = sinks.markdown_page_rows(
        load_table(spark, sf_dir, "documents").limit(5)
    )
    n = sinks.export_markdown_pages(pages, str(tmp_path))
    assert n == 5
    files = sorted(os.listdir(tmp_path / "pages"))
    assert len(files) == 10  # 5 pages + 5 .summary sidecars
    md = [f for f in files if f.endswith(".md")]
    body = (tmp_path / "pages" / md[0]).read_text()
    sidecar = (tmp_path / "pages" / md[0].replace(".md", ".summary")).read_text()
    assert body.startswith(sidecar[:50])  # summary is a prefix of the page
    assert len(sidecar) <= 500


def test_pages_parquet_sink_prunes_summary(spark, sf_dir, tmp_path):
    pages = sinks.markdown_page_rows(load_table(spark, sf_dir, "documents"))
    out = str(tmp_path / "pages_pq")
    sinks.write_pages_parquet(pages, out)
    # the reference's 'read sidecar not page' trick is column pruning here
    plan = (
        spark.read.parquet(out)
        .select("summary")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "content" not in plan.lower().split("readschema")[-1][:200]


def test_pipe_docs_renders(spark, sf_dir):
    from ai_knowledge_etl_spark.registry import REGISTRY

    lines = REGISTRY["sink-index-report"].spark(spark, sf_dir)
    doc = sinks.pipe_docs(lines, "INDEX").first()["doc"]
    assert doc.startswith("# INDEX\n\n- [")
    assert doc.count("\n- [") >= 19  # 20 sources, sorted lines


def test_resolve_directory_excludes(spark, tmp_path):
    (tmp_path / "keep").mkdir()
    (tmp_path / "node_modules").mkdir()
    (tmp_path / "keep" / "a.txt").write_text("hello")
    (tmp_path / "node_modules" / "b.txt").write_text("junk")
    df = detect.resolve(spark, str(tmp_path) + "/")
    paths = [r["path"] for r in df.select("path").collect()]
    assert any("a.txt" in p for p in paths)
    assert not any("node_modules" in p for p in paths)


def test_resolve_url_is_frontier_row(spark):
    df = detect.resolve(spark, "https://example.com/x")
    assert df.columns == ["url"] and df.count() == 1


def test_scan_git_repo(spark, tmp_path):
    # this repo itself is the fixture: shallow-clone file://… and scan docs
    df = detect.scan_git_repo(spark, "file:///root/repo", str(tmp_path))
    paths = [r["path"] for r in df.select("path").collect()]
    assert any(p.endswith("README.md") for p in paths)
    assert not any("/.git/" in p for p in paths)
