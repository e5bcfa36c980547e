"""Regression pins for the round-9 ADVICE fixes.

- register_views cache keyed by the SparkSession OBJECT (not id(spark)):
  CPython reuses ids after GC, so an id key is only safe while the entry
  pins the session; object keys give identity semantics with no reuse
  hazard, and dead-context entries are swept on every call so stopped
  sessions can't accumulate forever (sources/catalog.py).
- fresh-JVM probe subprocess timeout capped at the remaining phase
  budget (bench.py): a fixed 600 s timeout let one hung probe overshoot
  the 480 s budget by up to 10 minutes.
- rejected:duplicate bucket emitted unconditionally on BOTH sides of
  pipeline-image-curate-real: Spark's ungrouped aggregate always
  produces one row (n=0 with no twins) while the old VALUES oracle
  omitted the bucket entirely — a latent mismatch if the population
  changes so twins vanish. The oracle's duplicate branch is now a
  global aggregate too.
- encode_mp4_skeleton clamps the mvhd v0 duration to uint32 max
  (0xFFFFFFFF, also the spec's duration-unknown sentinel) instead of
  dying in struct.pack inside a mapInPandas batch for one pathological
  row (multimodal/miniwav.py).
"""

from __future__ import annotations

import re


# --- view cache: object keys + dead-session sweep ---------------------------


def test_register_views_keyed_by_session_object(spark, sf_dir):
    from ai_knowledge_etl_spark.sources import catalog

    catalog.register_views(spark, sf_dir)
    keys = [k for k in catalog._VIEWS_REGISTERED if k[0] is spark]
    assert keys, "cache must key by the session object itself"
    # no raw-int id keys anywhere (the r9 hazard)
    assert all(
        not isinstance(k[0], int) for k in catalog._VIEWS_REGISTERED
    )


def test_register_views_sweeps_dead_sessions(spark, sf_dir):
    """An entry whose SparkContext reads as stopped is evicted on the
    next call. Simulated with a stand-in key object (stopping the real
    shared session would kill the test JVM): the sweep's liveness probe
    is `key.sparkContext._jsc is None` / raising — both mean dead."""
    from ai_knowledge_etl_spark.sources import catalog

    class _DeadSession:
        @property
        def sparkContext(self):
            raise RuntimeError("context stopped")

    dead = _DeadSession()
    catalog._VIEWS_REGISTERED[(dead, "/nonexistent")] = {}
    catalog.register_views(spark, sf_dir)
    assert all(
        k[0] is not dead for k in catalog._VIEWS_REGISTERED
    ), "dead-session entries must be swept"


# --- bench fresh-JVM probe: timeout respects the phase budget ---------------


def test_fresh_jvm_probe_timeout_capped_by_budget():
    with open("bench.py") as f:
        src = f.read()
    assert "probe_timeout = max(" in src
    assert "timeout=probe_timeout" in src
    # the old fixed-600 s subprocess timeout must be gone
    assert not re.search(r"timeout=600\b", src)


# --- curate-real duplicate bucket: unconditional on both sides --------------


def test_curate_real_oracle_duplicate_bucket_unconditional(spark, sf_dir):
    """The oracle's rejected:duplicate branch must be a GLOBAL aggregate
    (one row even for zero duplicates), mirroring Spark's ungrouped
    agg — pinned by running the oracle against a documents slice too
    small to produce twins (< N_COMPRESS_CARDS images)."""
    import duckdb

    from ai_knowledge_etl_spark.registry import REGISTRY, oracle_of

    sql = oracle_of(REGISTRY["pipeline-image-curate-real"])
    con = duckdb.connect()
    # 100 docs -> 4 images -> 4 distinct cards -> zero duplicate twins
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet' WHERE doc_id < 100"
    )
    rows = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert rows.get("rejected:duplicate") == 0


# --- mvhd duration clamp ----------------------------------------------------


def test_mp4_duration_clamps_to_uint32():
    from ai_knowledge_etl_spark.multimodal import miniwav

    blob = miniwav.encode_mp4_skeleton(2**40, timescale=1000)
    m = miniwav.parse_mp4_header(blob)
    assert m is not None and m["duration"] == 0xFFFFFFFF
    # in-range values still round-trip exactly
    m2 = miniwav.parse_mp4_header(miniwav.encode_mp4_skeleton(90000))
    assert m2 is not None and m2["duration"] == 90000
