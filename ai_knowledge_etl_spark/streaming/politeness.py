"""Politeness / rate limiting (reference: config/limits.yaml:105 — ≥2 s
between requests; config/security.yaml:115-116 — jina ≤20 req/min).

Two layers:

  - `pacing_schedule` — the *deterministic plan*: per-domain request
    ordering and send offsets (rn-1)*interval. Pure window arithmetic,
    oracle-checkable, and the input to capacity planning (a domain with
    10k URLs at 2 s spacing is a 5.5 h crawl — visible before fetching).
  - `rate_limited_fetch` — the *executor-side enforcement*: repartition by
    domain so one partition owns a domain's queue, then a token-bucket
    sleep inside mapInPandas around the fetch callable. No global locks —
    politeness is per-domain, so partition-local state is exactly right
    (SURVEY §7 watch-list #7).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config


def pacing_schedule(
    urls: DataFrame,
    domain_col: str = "domain",
    order_col: str = "url",
    interval_s: float = config.REQUEST_INTERVAL_SECONDS,
) -> DataFrame:
    """Assign each URL its in-domain position and send offset."""
    w = Window.partitionBy(domain_col).orderBy(F.asc(order_col))
    rn = F.row_number().over(w)
    return urls.select(
        domain_col,
        order_col,
        rn.cast("int").alias("rn"),
        ((rn - 1).cast("double") * interval_s).alias("send_offset_s"),
    )


def rate_limited_fetch(
    urls: DataFrame,
    fetch: Callable[[str], str],
    url_col: str = "url",
    domain_col: str = "domain",
    interval_s: float = config.REQUEST_INTERVAL_SECONDS,
    n_domain_partitions: int = 64,
) -> DataFrame:
    """Fetch with per-domain pacing. Errors are data, never exceptions
    (reference: agents/extractor.md:747 'never silently fail' +
    image-analyzer.md:224-240 error records)."""
    schema = f"{url_col} string, body string, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_hit: dict[str, float] = {}
        for pdf in batches:
            out = {"url": [], "body": [], "error": []}
            for url, dom in zip(pdf[url_col], pdf[domain_col]):
                wait = last_hit.get(dom, 0.0) + interval_s - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                last_hit[dom] = time.monotonic()
                try:
                    out["body"].append(fetch(url))
                    out["error"].append(None)
                except Exception as e:  # noqa: BLE001 — error-as-data
                    out["body"].append(None)
                    out["error"].append(f"{type(e).__name__}: {e}")
                out["url"].append(url)
            yield pd.DataFrame(out)

    return urls.repartition(n_domain_partitions, domain_col).mapInPandas(
        run, schema
    )
