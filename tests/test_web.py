"""Web connector: injected fake fetcher, security routing, retry/backoff,
error-as-data, obstacle classification, frontmatter wrap. No network."""

from __future__ import annotations

from ai_knowledge_etl_spark.sources import web

FAKE_SITE = {
    "https://src1.example.com/docs/item1": "<html><body><h1>Spark guide</h1>"
    + "<p>shuffle partition join</p>" * 30
    + "<script>x()</script></body></html>",
    "https://src2.example.com/about/item2": "<html><body>Please log in to continue"
    + " auth wall" * 30
    + "</body></html>",
    "https://src3.example.com/blog/item3": "<html><body>tiny</body></html>",
}


def make_fake_fetch():
    """Built per-test so cloudpickle ships it by value — a module-level
    function in tests/ isn't importable from Spark's Python workers."""
    site = dict(FAKE_SITE)

    def fake_fetch(url: str) -> str:
        if url not in site:
            raise ConnectionError(f"404 {url}")
        return site[url]

    return fake_fetch


def test_backoff_schedule():
    assert web.backoff_schedule() == [1.0, 2.0, 4.0]
    assert web.backoff_schedule(5, 1.0, 10.0) == [1.0, 2.0, 4.0, 8.0, 10.0]


def test_retry_error_as_data():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise TimeoutError("slow")
        return "ok"

    out, err = web.retry_with_backoff(flaky, sleep=lambda s: None)
    assert out == "ok" and err is None and len(calls) == 3

    out, err = web.retry_with_backoff(
        lambda: (_ for _ in ()).throw(ValueError("boom")), sleep=lambda s: None
    )
    assert out is None and "ValueError" in err


def test_strip_boilerplate_fallback():
    txt = web.strip_boilerplate(FAKE_SITE["https://src1.example.com/docs/item1"])
    assert "Spark guide" in txt
    assert "x()" not in txt  # script stripped


def test_fetch_pipeline_end_to_end(spark):
    urls = spark.createDataFrame(
        [(u,) for u in FAKE_SITE] + [("https://src9.example.com/missing",)],
        "url string",
    )
    out = {
        r["url"]: r
        for r in web.fetch_pipeline(urls, make_fake_fetch(), interval_s=0).collect()
    }

    good = out["https://src1.example.com/docs/item1"]
    assert good["error"] is None
    assert "shuffle partition join" in good["text"]
    assert good["obstacle"] == "NONE"
    assert good["doc"].startswith("---\nsource: https://src1")

    login = out["https://src2.example.com/about/item2"]
    assert login["obstacle"] == "LOGIN_REQUIRED"

    tiny = out["https://src3.example.com/blog/item3"]
    assert tiny["obstacle"] == "ANTI_SCRAPE"  # <100 chars

    missing = out["https://src9.example.com/missing"]
    assert missing["text"] is None
    assert "ConnectionError" in missing["error"]


def test_fetch_pipeline_skips_skippable(spark):
    urls = spark.createDataFrame(
        [("https://a.example.com/login",), ("https://a.example.com/file.zip",)],
        "url string",
    )
    assert web.fetch_pipeline(urls, make_fake_fetch(), interval_s=0).count() == 0


def test_scan_web_connector_end_to_end(spark, sf_dir):
    """VERDICT r1 #7: the frontier wave flows connector -> politeness ->
    retry -> strip -> classify in one lazy plan, with errors as data."""
    from ai_knowledge_etl_spark.registry import REGISTRY

    df = REGISTRY["scan-web-connector"].spark(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 158  # 210 pages, depth<3 pushed into the reader
    failed = [r for r in rows if not r["ok"]]
    assert failed, "synthetic 404s must surface as error rows"
    # error rows carry no text -> classified ANTI_SCRAPE, never dropped
    assert all(r["obstacle"] == "ANTI_SCRAPE" for r in failed)
    assert any(r["obstacle"] == "LOGIN_REQUIRED" for r in rows if r["ok"])


def test_connector_frontier_is_partitioned_per_domain(spark):
    """The planned scan must hand politeness one partition per domain —
    the layout rate_limited_fetch's per-domain pacing depends on."""
    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )
    from ai_knowledge_etl_spark.sources.pagesource import (
        CrawlPagesDataSource,
    )

    ensure_package_on_workers(spark)
    spark.dataSource.register(CrawlPagesDataSource)
    frontier = spark.read.format("crawlpages").option("n", 210).load()
    assert frontier.rdd.getNumPartitions() == 7
