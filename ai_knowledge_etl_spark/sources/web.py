"""Web extraction connector (reference: scripts/extract-jina.sh,
scripts/extract-trafilatura.sh, commands/extract.md:445-559).

The fetch kernel is injected (`fetcher: url -> html`) — tests use fakes, a
deployment plugs requests/playwright in. Everything around it is the real
engine: security routing, per-domain politeness, retry with backoff,
error-as-data, obstacle classification, frontmatter wrapping, boilerplate
stripping (trafilatura when importable, regex fallback otherwise).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config
from ai_knowledge_etl_spark.functions import text as TX
from ai_knowledge_etl_spark.functions import urls as U
from ai_knowledge_etl_spark.streaming import politeness


def backoff_schedule(
    attempts: int = 3, base_s: float = 1.0, cap_s: float = 10.0
) -> list[float]:
    """1s → 2s → 4s, capped (reference: agents/extractor.md:694-737,
    config/limits.yaml:125-129)."""
    return [min(base_s * (2**i), cap_s) for i in range(attempts)]


def retry_with_backoff(
    fn: Callable[[], str],
    attempts: int = 3,
    base_s: float = 1.0,
    cap_s: float = 10.0,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[str | None, str | None]:
    """(result, error) — error-as-data, never raises
    (reference: extractor.md:747 'never silently fail')."""
    last = "no attempts"
    for i, delay in enumerate(backoff_schedule(attempts, base_s, cap_s)):
        try:
            return fn(), None
        except Exception as e:  # noqa: BLE001
            last = f"{type(e).__name__}: {e}"
            if i < attempts - 1:
                sleep(delay)
    return None, last


def strip_boilerplate(html: str) -> str:
    """trafilatura when importable; regex tag-strip fallback otherwise
    (reference: extract-trafilatura.sh:46-63)."""
    try:
        import trafilatura  # type: ignore

        out = trafilatura.extract(html, favor_precision=True)
        if out:
            return out
    except ImportError:
        pass
    import re

    no_script = re.sub(
        r"(?is)<(script|style|nav|footer)[^>]*>.*?</\1>", " ", html or ""
    )
    text = re.sub(r"(?s)<[^>]+>", " ", no_script)
    return re.sub(r"\s+", " ", text).strip()


def demo_fetcher(url: str) -> str:
    """Deterministic offline fetcher: synthesizes a page from the URL alone
    (module-level so Spark workers can unpickle it). Lets the full fetch
    pipeline run end-to-end with zero network — the driver's rows-only
    check and local demos use it; deployments inject a real fetcher."""
    h = sum(ord(c) for c in url)
    if h % 13 == 0:
        raise ConnectionError(f"synthetic 404 for {url}")
    body = f"<h1>Page {h % 1000}</h1>" + "<p>spark shuffle join content</p>" * (
        h % 7 + 1
    )
    if h % 11 == 0:
        body = "please log in to continue " * 10
    return f"<html><body>{body}</body></html>"


CRAWL_ANCHORS = (
    "spark tuning",
    "shuffle internals",
    "join guide",
    "pricing page",
)


def demo_fetcher_linked(url: str) -> str:
    """demo_fetcher plus embedded markdown links, so the full crawl loop
    (fetch → extract links → score → enqueue) runs offline. Link targets
    and anchors are pure arithmetic in h = sum(ord(url)) — which makes the
    ENTIRE multi-wave crawl SQL-replayable (the pipeline-crawl-e2e oracle
    regenerates every wave with a recursive CTE). Same failure modes as
    demo_fetcher: h%13 → connection error, h%11 → login wall (no links)."""
    h = sum(ord(c) for c in url)
    if h % 13 == 0:
        raise ConnectionError(f"synthetic 404 for {url}")
    if h % 11 == 0:
        return "<html><body>" + "please log in to continue " * 10 + "</body></html>"
    body = f"<h1>Page {h % 1000}</h1>" + "<p>spark shuffle join content</p>" * (
        h % 7 + 1
    )
    for i in range(1, h % 3 + 2):
        anchor = CRAWL_ANCHORS[(h + i) % 4]
        target = f"https://site{h % 5}.example.com/p/{(h * 7 + i * 13) % 400}"
        body += f"<p>see [{anchor}]({target})</p>"
    return f"<html><body>{body}</body></html>"


def fetch_pipeline(
    urls_df: DataFrame,
    fetcher: Callable[[str], str],
    interval_s: float = config.REQUEST_INTERVAL_SECONDS,
    n_domain_partitions: int = 64,
) -> DataFrame:
    """Route → politeness-paced fetch → boilerplate strip → obstacle
    classify → frontmatter header. The full single-page lifecycle
    (SURVEY §3.1) as one lazy plan; the fetch UDF runs on executors with
    per-domain pacing, the rest is Catalyst column work."""
    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )

    # direct API users (README quick-start) call this without going through
    # the registry/catalog path — ship the package so the mapInPandas
    # kernels resolve on workers regardless of the caller's cwd
    ensure_package_on_workers(urls_df.sparkSession)

    routed = urls_df.select(
        "url",
        U.domain("url").alias("domain"),
        U.security_route("url").alias("engine"),
    ).where(~U.is_skippable("url"))

    def paced_fetch(url: str) -> str:
        body, err = retry_with_backoff(lambda: fetcher(url), sleep=lambda s: None)
        if err:
            raise RuntimeError(err)
        return body

    fetched = politeness.rate_limited_fetch(
        routed, paced_fetch, "url", "domain", interval_s, n_domain_partitions
    )

    schema = "url string, text string, error string"

    def clean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": [
                        strip_boilerplate(b) if b is not None else None
                        for b in pdf["body"]
                    ],
                    "error": pdf["error"],
                }
            )

    cleaned = fetched.mapInPandas(clean, schema)

    return cleaned.select(
        "url",
        "text",
        "error",
        TX.obstacle_type(F.coalesce(F.col("text"), F.lit(""))).alias("obstacle"),
        F.concat(
            F.lit("---\n"),
            F.lit("source: "), F.col("url"), F.lit("\n"),
            F.lit("engine: spark-etl\n"),
            F.lit("---\n"),
            F.coalesce(F.col("text"), F.lit("")),
        ).alias("doc"),
    )
