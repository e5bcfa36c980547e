"""as-of join semantics the oracle can't isolate: ties, no-match rows,
multiple references per key."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import asof


def test_asof_tie_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 50, "b"), (2, 10, "c")], ["k", "t", "tag"]
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 60, 2.0), (1, 10, 3.0)], ["k", "rt", "v"]
    )
    out = {
        r["tag"]: (r["asof_v"], r["asof_ts"])
        for r in asof.asof_join(
            left, right, on="k", left_ts="t", right_ts="rt", value_cols=["v"]
        ).collect()
    }
    assert out["a"] == (1.0, 100)  # tie: reference AT the ts matches
    assert out["b"] == (3.0, 10)   # skips future refs (60, 100)
    assert out["c"] == (None, None)  # key with no references at all


def test_asof_takes_latest_not_any(spark):
    left = spark.createDataFrame([(1, 1000)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, i * 10, float(i)) for i in range(50)], ["k", "rt", "v"]
    )
    row = asof.asof_join(
        left, right, on="k", left_ts="t", right_ts="rt", value_cols=["v"]
    ).collect()[0]
    assert row["asof_v"] == 49.0 and row["asof_ts"] == 490
