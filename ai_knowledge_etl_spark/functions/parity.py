"""Cross-engine exact-arithmetic helpers for oracle parity.

The round-tie class (found by the round-7 wide-vocab and seed sweeps —
docs/PERF.md): engine round() of an EXACT finite-decimal ratio is
tie-unsafe across engines. When the true value ends exactly in ...5 at
the rounded digit, Spark (shortest-string BigDecimal HALF_UP of its
double) and DuckDB (float multiply + nearbyint of its own) can resolve
the tie from opposite sides. Observed three times before this helper
existed: udf-readability (flesch proxy at exactly -109.44875),
udf-lexical-diversity (same shape), similarity-kmeans-ann (avg_dist at
exactly 0.93735). The repair is to round in EXACT integer arithmetic —
cross-multiplied, half-away-from-zero — identically in both engines,
and only then convert the (small) rounded integer to DOUBLE.

Values are deterministic by construction: the rounded integer is far
below 2^53, so the final int->double cast and the /10^digits divide are
bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def round_ratio_sql(num: str, den: str, digits: int, big: str, idiv: str) -> str:
    """round-half-away-from-zero(num/den, digits) in EXACT integer
    arithmetic, emitted as DOUBLE.

    num/den: integer-valued SQL expressions, den > 0. big/idiv: the
    engine's wide-integer type and integral-division operator —
    ('DECIMAL(38,0)', 'DIV') for Spark, ('HUGEINT', '//') for DuckDB.

    IMPORTANT: the CAST to the wide type happens AFTER the num/den
    expressions have already been evaluated in the engine's native
    integer width (BIGINT). Any arithmetic INSIDE num/den must itself
    fit in signed 64 bits, or it silently wraps (Spark non-ANSI)
    before this helper ever sees it. If a caller's numerator is a
    product that can approach 2^63 (e.g. big_count * big_count), the
    caller must pre-widen an operand inside the expression, e.g.
    ``CAST(n_sentences AS DECIMAL(38,0)) * n_words`` — this helper
    only widens the *result* of num/den for the scale-by-10^digits
    step that follows.
    """
    p = 10 ** digits
    n = f"CAST({num} AS {big})"
    d = f"CAST({den} AS {big})"
    s = f"({n} * {p})"
    mag = f"((2 * abs({s}) + {d}) {idiv} (2 * {d}))"
    return (
        f"((CASE WHEN {s} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"CAST({mag} AS DOUBLE) / {p}.0)"
    )


def round_ratio_spark(num: str, den: str, digits: int) -> F.Column:
    return F.expr(round_ratio_sql(num, den, digits, "DECIMAL(38,0)", "DIV"))


def round_ratio_duck(num: str, den: str, digits: int) -> str:
    return round_ratio_sql(num, den, digits, "HUGEINT", "//")
