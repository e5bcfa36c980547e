"""Property tests: the banded interval-overlap rewrite must be EXACTLY the
brute-force inequality join (same pairs, each exactly once) on arbitrary
interval sets — the guard condition is subtle enough (first-common-bucket,
boundary-touching bins) that random inputs are the only honest check. Also
pins the PNG codec round-trip on arbitrary pixel buffers (the phash ops
hash DECODED bytes, so lossless decode is load-bearing)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

interval = st.tuples(
    st.integers(min_value=0, max_value=3),      # key
    st.integers(min_value=0, max_value=2000),   # start
    st.integers(min_value=1, max_value=700),    # length
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(interval, min_size=1, max_size=25),
    rights=st.lists(interval, min_size=1, max_size=25),
    width=st.sampled_from([64, 256, 1024]),
)
def test_banded_overlap_equals_brute_force(spark, lefts, rights, width):
    from ai_knowledge_etl_spark.operators.intervals import (
        interval_overlap_join,
    )

    ldf = spark.createDataFrame(
        [(i, k, s, s + n) for i, (k, s, n) in enumerate(lefts)],
        "lid int, k int, s0 long, s1 long",
    )
    rdf = spark.createDataFrame(
        [(i, k, s, s + n) for i, (k, s, n) in enumerate(rights)],
        "rid int, k int, i0 long, i1 long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, "k", ("s0", "s1"), ("i0", "i1"), width=width
        ).select("lid", "rid").collect()
    )
    want = sorted(
        (la, rb)
        for la, (ka, sa, na) in enumerate(lefts)
        for rb, (kb, sb, nb) in enumerate(rights)
        if ka == kb and sa < sb + nb and sb < sa + na
    )
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_minipng_roundtrip_lossless(w, h, data):
    from ai_knowledge_etl_spark.multimodal import minipng

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=3 * w * h, max_size=3 * w * h
            )
        )
    )
    png = minipng.encode_png(w, h, rgb)
    w2, h2, out = minipng.decode_png(png)
    assert (w2, h2, bytes(out)) == (w, h, rgb)
