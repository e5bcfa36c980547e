"""Text scalar kernels — flags, truncation, structure, token/quality stats.

Re-implements the reference's text projections (reference:
DESIGN.md:983-996,1293-1313, skills/content-safeguard/SKILL.md:130-137)
plus the north-star text-analysis operators (language ID, quality scoring,
token counting, fingerprinting) as pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def has_code(text: Column | str) -> Column:
    """True when the text contains a fenced code block (reference: DESIGN.md:1297)."""
    return _c(text).rlike("```")


def has_table(text: Column | str) -> Column:
    """True when the text contains a markdown table row (reference: DESIGN.md:1298)."""
    return _c(text).rlike(r"\|.*\|")


def truncate_with_notice(
    text: Column | str,
    max_chars: int = config.MAX_TOTAL_OUTPUT_CHARS,
    notice: str = config.TRUNCATE_NOTICE,
) -> Column:
    """Truncate at `max_chars` and append a visible notice (reference:
    DESIGN.md:983-996, content-safeguard SKILL.md:130-137). Never silently cuts."""
    t = _c(text)
    return F.when(
        F.length(t) > max_chars,
        F.concat(F.substring(t, 1, max_chars), F.lit(notice)),
    ).otherwise(t)


def extract_headings(text: Column | str) -> Column:
    """All markdown headings as an array (reference: DESIGN.md:1007-1009,
    crawler-summarizer.md:296-306)."""
    return F.regexp_extract_all(_c(text), F.lit(r"(?m)^(#{1,6} .*)$"), 1)


def title_of(text: Column | str, n: int = 60) -> Column:
    """Deterministic title surrogate: first `n` chars (the fixture corpus has
    no frontmatter titles)."""
    return F.substring(_c(text), 1, n)


def word_count(text: Column | str) -> Column:
    """Whitespace token count — north-star token counting baseline."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def char_count(text: Column | str) -> Column:
    return F.length(_c(text))


def avg_word_len(text: Column | str) -> Column:
    """Mean token length — a quality-scoring feature."""
    t = F.trim(_c(text))
    return F.length(F.regexp_replace(t, r"\s+", "")) / word_count(t)


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars — a quality-scoring feature."""
    t = _c(text)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return punct / F.length(t)


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text — the exact-dedup key (north-star dedup baseline)."""
    norm = F.lower(F.trim(F.regexp_replace(_c(text), r"\s+", " ")))
    return F.md5(norm)


def obstacle_type(text: Column | str) -> Column:
    """Classify page text into an obstacle type (reference: DESIGN.md:798-852,
    commands/extract.md:458-465): near-empty content → ANTI_SCRAPE, then
    login/captcha/anti-bot regex probes, else NONE. Errors are data, not
    exceptions — at 100 TB one bad page must never kill the job."""
    t = F.lower(_c(text))
    return (
        F.when(
            F.length(F.trim(t)) < config.OBSTACLE_MIN_CHARS, F.lit("ANTI_SCRAPE")
        )
        .when(t.rlike(config.OBSTACLE_LOGIN_RE), F.lit("LOGIN_REQUIRED"))
        .when(t.rlike(config.OBSTACLE_CAPTCHA_RE), F.lit("CAPTCHA"))
        .when(t.rlike(config.OBSTACLE_ANTIBOT_RE), F.lit("ANTI_BOT"))
        .otherwise(F.lit("NONE"))
    )


# Tiny per-language stopword probes for the n-gram-heuristic language ID.
# Deliberately small and deterministic; real corpora would plug a model UDF in.
LANG_PROBES: dict[str, str] = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|les|et|des)\b",
    "es": r"\b(el|los|las|una|es)\b",
    "zh": r"[一-鿿]",
}


def lang_guess(text: Column | str) -> Column:
    """Heuristic language ID: the probe with the most hits wins; ties break
    by probe order; no hits → 'und'. North-star text-analysis operator."""
    t = F.lower(_c(text))
    counts = {
        lang: F.size(F.regexp_extract_all(t, F.lit(f"({probe})"), 1))
        for lang, probe in LANG_PROBES.items()
    }
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_PROBES)):
        expr = F.when(
            (counts[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


# --- PII redaction (training-data extension; Java-regex ∩ RE2 patterns) --------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_CARD = r"\b[0-9]{13,16}\b"
PII_PHONE = r"\+?[0-9][0-9 ()\-]{6,}[0-9]"


def redact_pii(text: Column | str) -> Column:
    """Replace emails, card numbers, then phones with typed placeholders.
    Order matters: cards redact before the phone pattern can eat their
    digit runs. Pure JVM regexp_replace — no Python in the hot path."""
    c = F.regexp_replace(_c(text), PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_CARD, "<CARD>")
    return F.regexp_replace(c, PII_PHONE, "<PHONE>")


def pii_counts(text: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_cards, n_phones) found in `text` (pre-redaction)."""
    t = _c(text)
    without_cards = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_CARD, "<CARD>"
    )
    return (
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0)),
        F.size(F.regexp_extract_all(t, F.lit(PII_CARD), 0)),
        F.size(F.regexp_extract_all(without_cards, F.lit(PII_PHONE), 0)),
    )
