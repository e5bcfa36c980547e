"""Wide-vocabulary differential guard (round-6 verdict #5).

The fixture text has ~31 word types at any replication factor, so the
text-quality family was only ever differentially tested where vocabulary
caps never bind and top-K ties are pervasive. The full sweep
(`python tools/difftest.py --vocab wide`) rewrites documents.text so
each (doc, pos) token carries an md5 suffix modulo V — ~V*31 types —
and re-runs the family; its first sf0.01 run caught a real divergence
(udf-readability's engine-level round() at the exact decimal tie
-109.44875, fixed via cross-multiplied integer rounding in
functions/parity.round_ratio_sql). This test pins the property in CI
on the queries most sensitive to vocabulary width: cap/top-K binding
(LM, vocab-topk, BPE), OOV mass, and the tie-prone rounded ratios.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from difftest import run_one, widevocab_dir  # noqa: E402

# One per vocabulary-sensitivity class: unigram-LM cap/OOV, top-K vocab
# ties, BPE merge ranking, perplexity bucket boundaries, the repaired
# tie-prone rounded ratios, and shingle uniqueness.
WIDE_QUERIES = [
    "udf-unigram-logprob",
    "agg-vocab-topk",
    "agg-bpe-merges",
    "sample-perplexity-buckets",
    "udf-readability",
    "udf-lexical-diversity",
    "dedup-ngram-jaccard",
]


@pytest.fixture(scope="module")
def wide(sf_dir):
    return widevocab_dir(sf_dir)


@pytest.fixture(scope="module")
def wide_duck(wide):
    import duckdb

    from ai_knowledge_etl_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(wide, f"{t}.parquet")
        if os.path.exists(src):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", WIDE_QUERIES)
def test_query_survives_wide_vocabulary(spark, wide, wide_duck, name):
    ok, msg = run_one(spark, wide_duck, name, wide)
    assert ok, f"{name} at wide vocab: {msg}"


def test_rounding_tie_is_engine_independent(spark, sf_dir):
    """The exact regression: flesch proxy at W=96, S=1, C=745 is exactly
    -109.44875 — a 4-decimal rounding tie. Cross-multiplied integer
    rounding must resolve it half-away-from-zero in both engines."""
    import duckdb

    from ai_knowledge_etl_spark.registry.northstar import _rr_duck, _rr_spark

    con = duckdb.connect()
    duck = con.execute(
        "SELECT "
        + _rr_duck(
            "206835 * s * w - 1015 * w * w - 28200 * c * s",
            "1000 * s * w",
            4,
        )
        + " FROM (SELECT 96 AS w, 1 AS s, 745 AS c)"
    ).fetchone()[0]
    row = (
        spark.createDataFrame([(96, 1, 745)], "w long, s long, c long")
        .select(
            _rr_spark(
                "206835 * s * w - 1015 * w * w - 28200 * c * s",
                "1000 * s * w",
                4,
            ).alias("v")
        )
        .collect()[0]
    )
    assert duck == row["v"] == -109.4488
