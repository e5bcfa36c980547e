"""URL scalar kernels — pure column expressions.

Re-implements the reference's URL handling (reference:
scripts/crawler-queue.sh:180-228, scripts/extract-jina.sh:19-54,
config/limits.yaml:187-202, config/security.yaml:17-104) as Catalyst column
expressions. All regexes live in `config` and stay in the Java-regex ∩ RE2
subset so the DuckDB oracle can evaluate the identical pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config

DOMAIN_RE = r"https?://([^/]+)"


def domain(url: Column | str) -> Column:
    """Host part of a URL (reference: scripts/crawler-queue.sh:180-184).

    `regexp_extract` rather than `parse_url` so the DuckDB oracle can run the
    byte-identical pattern.
    """
    return F.regexp_extract(url, DOMAIN_RE, 1)


def normalize(url: Column | str) -> Column:
    """Strip '#fragment' and a trailing '/' (reference: crawler-queue.sh:220-228)."""
    return F.regexp_replace(F.regexp_replace(url, "#.*$", ""), "/$", "")


def slug(url: Column | str, max_len: int = 50) -> Column:
    """URL → safe filename (reference: scripts/extract-jina.sh:54):
    strip scheme, non-alnum → '_', truncate."""
    no_scheme = F.regexp_replace(url, "https?://", "")
    safe = F.regexp_replace(no_scheme, "[^a-zA-Z0-9]", "_")
    return F.substring(safe, 1, max_len)


def is_skippable(url: Column | str) -> Column:
    """True when the URL should never be fetched (reference:
    scripts/crawler-queue.sh:199-218): binary/media/static extensions,
    auth/commerce/static paths, or pure same-page anchors."""
    u = F.lower(F.col(url) if isinstance(url, str) else url)
    return (
        u.rlike(config.URL_SKIP_EXT_RE)
        | u.rlike(config.URL_SKIP_PATH_RE)
        | u.startswith("#")
    )


def same_domain(url: Column | str, entry_domain: str) -> Column:
    """True when the URL's host equals the crawl entry host
    (reference: scripts/crawler-queue.sh:186-197)."""
    return domain(url) == F.lit(entry_domain)


def security_route(url: Column | str) -> Column:
    """Route a URL to an extraction engine (reference:
    commands/extract.md:92-155, config/security.yaml:17-104):
    internal domains / private IPs / sensitive query params force the local
    engine; everything else may use an external reader."""
    u = F.lower(F.col(url) if isinstance(url, str) else url)
    return (
        F.when(u.rlike(config.PRIVATE_IP_RE), F.lit("local"))
        .when(u.rlike(config.INTERNAL_DOMAIN_RE), F.lit("local"))
        .when(u.rlike(config.SENSITIVE_KEYWORD_RE), F.lit("local"))
        .otherwise(F.lit("external"))
    )
