"""Property tests for the WARC parser (sources/warc.py): roundtrip any
payload bytes (including payloads that CONTAIN the record magic — the
Content-Length discipline must never scan inside a well-formed payload),
and recovery across arbitrary inter-record garbage."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_knowledge_etl_spark.sources.warc import parse_warc_bytes

_uri = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=30,
)
_payload = st.binary(max_size=200)


def _record(uri: str, payload: bytes) -> bytes:
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
        + uri.encode()
        + b"\r\nContent-Length: "
        + str(len(payload)).encode()
        + b"\r\n\r\n"
        + payload
        + b"\r\n\r\n"
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_uri, _payload), max_size=8))
def test_roundtrip_any_payload(recs):
    raw = b"".join(_record(u, p) for u, p in recs)
    parsed, skipped = parse_warc_bytes(raw)
    assert skipped == 0
    assert [(u, n) for u, n, _, _ in parsed] == [
        (u, len(p)) for u, p in recs
    ]
    for (_, _, head, _), (_, p) in zip(parsed, recs):
        assert head == p.decode("utf-8", "replace")[:40]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            _uri,
            st.text(max_size=80),  # arbitrary unicode incl. multibyte
        ),
        max_size=6,
    )
)
def test_head_is_40_characters_for_multibyte_text(recs):
    """Regression (round-3 advisor): head must be the first 40 CHARACTERS
    of the decoded text, matching the oracle's substring(text, 1, 40) —
    a 40-BYTE truncation would split multibyte chars and diverge."""
    raw = b"".join(_record(u, t.encode("utf-8")) for u, t in recs)
    parsed, skipped = parse_warc_bytes(raw)
    assert skipped == 0
    for (_, _, head, _), (_, t) in zip(parsed, recs):
        assert head == t[:40]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(_uri, _payload), min_size=1, max_size=5),
    st.lists(
        st.binary(max_size=40).filter(lambda g: b"WARC/1.0" not in g),
        min_size=1,
        max_size=6,
    ),
)
def test_resync_across_garbage(recs, garbage):
    """Garbage (no magic inside) interleaved between records: every record
    still parses; skipped counts exactly the garbage bytes."""
    parts, g_total = [], 0
    gs = list(garbage)
    for u, p in recs:
        if gs:
            g = gs.pop(0)
            parts.append(g)
            g_total += len(g)
        parts.append(_record(u, p))
    raw = b"".join(parts)
    parsed, skipped = parse_warc_bytes(raw)
    assert [(u, n) for u, n, _, _ in parsed] == [
        (u, len(p)) for u, p in recs
    ]
    assert skipped == g_total
