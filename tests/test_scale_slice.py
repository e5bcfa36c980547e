"""Slice-generator invariants (round-6 verdict #1).

tools/scale_sweep.py --slice DIV materializes an md5-gated 1/DIV slice
of the mult-x corpus so the DuckDB oracle can value-verify queries whose
full-scale twin OOMs. The differential itself is exact by construction
(both engines read the same parquet); what CAN silently break is the
slice's structure — these pin it:

  - determinism: two generations produce identical key sets;
  - join preservation: orders and lineitem are gated on the SAME scaled
    orderkey, so every kept lineitem row still has its order (no
    orphaned fact rows, fan-out of kept keys untouched);
  - event density: events are gated on user_id, so a kept user carries
    ALL mult replicas of their events (per-user state size is the
    streaming family's scale dimension and must not be thinned);
  - the gate actually slices (kept fraction ~ 1/DIV).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import scale_sweep  # noqa: E402

MULT, DIV = 3, 4


def _gen(sf_dir: str, out: str) -> str:
    old = scale_sweep.BASE
    scale_sweep.BASE = sf_dir
    try:
        scale_sweep.generate(MULT, out, slice_div=DIV)
    finally:
        scale_sweep.BASE = old
    return out


@pytest.fixture(scope="module")
def sliced(tmp_path_factory, sf_dir):
    return _gen(sf_dir, str(tmp_path_factory.mktemp("slice")))


def test_generation_is_deterministic(tmp_path, sf_dir, sliced):
    out2 = _gen(sf_dir, str(tmp_path / "again"))
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "documents"):
        counts = con.execute(
            f"SELECT (SELECT count(*) FROM '{sliced}/{t}.parquet'),"
            f" (SELECT count(*) FROM '{out2}/{t}.parquet')"
        ).fetchone()
        assert counts[0] == counts[1], t
        diff = con.execute(
            f"SELECT count(*) FROM ("
            f"SELECT * FROM '{sliced}/{t}.parquet' EXCEPT "
            f"SELECT * FROM '{out2}/{t}.parquet')"
        ).fetchone()[0]
        assert diff == 0, t


def test_lineitem_orders_join_preserved(sliced, sf_dir):
    con = duckdb.connect()
    orphans = con.execute(
        f"""
        SELECT count(*) FROM '{sliced}/lineitem.parquet' l
        WHERE NOT EXISTS (SELECT 1 FROM '{sliced}/orders.parquet' o
                          WHERE o.o_orderkey = l.l_orderkey)
        """
    ).fetchone()[0]
    assert orphans == 0
    # fan-out of kept keys matches the unsliced mult-x corpus: each kept
    # scaled orderkey carries exactly its base key's lineitem rows
    bad = con.execute(
        f"""
        WITH base AS (
          SELECT l_orderkey, count(*) AS c
          FROM '{sf_dir}/lineitem.parquet' GROUP BY l_orderkey
        ),
        span AS (
          SELECT max(o_orderkey) + 1 AS s FROM '{sf_dir}/orders.parquet'
        ),
        got AS (
          SELECT l_orderkey, count(*) AS c
          FROM '{sliced}/lineitem.parquet' GROUP BY l_orderkey
        )
        SELECT count(*) FROM got g, span
        JOIN base b ON b.l_orderkey = g.l_orderkey % span.s
        WHERE b.c <> g.c
        """
    ).fetchone()[0]
    assert bad == 0


def test_kept_users_keep_full_replica_density(sliced, sf_dir):
    con = duckdb.connect()
    row = con.execute(
        f"""
        WITH base AS (
          SELECT user_id, count(*) AS c
          FROM '{sf_dir}/events.parquet' GROUP BY user_id
        ),
        got AS (
          SELECT user_id, count(*) AS c
          FROM '{sliced}/events.parquet' GROUP BY user_id
        )
        SELECT count(*),
               sum(CASE WHEN g.c <> b.c * {MULT} THEN 1 ELSE 0 END)
        FROM got g JOIN base b USING (user_id)
        """
    ).fetchone()
    n_kept, thinned = row
    assert n_kept > 0
    assert thinned == 0, "a kept user lost replicas — state density thinned"


def test_gate_slices_about_one_in_div(sliced, sf_dir):
    con = duckdb.connect()
    base = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    got = con.execute(
        f"SELECT count(*) FROM '{sliced}/documents.parquet'"
    ).fetchone()[0]
    frac = got / (base * MULT)
    assert 0.5 / DIV < frac < 2.0 / DIV, frac


# --- crawl-loop longevity (round-7 verdict #5) -----------------------------

_LONG_WAVES = 50
_LONG_WIDTH = 200  # pages per wave -> 10k pages over the whole crawl


def _make_long_web_fetcher(width: int):
    """Synthetic 50-wave web: page w{i}/p{j} links to wave i+1's pages j
    and (j+1) % width, so the frontier stays exactly width pages per wave
    and the visited set grows linearly to WAVES*width. Returned as a
    CLOSURE so cloudpickle ships it by value — a module-level function
    would pickle by reference and the executors don't import test
    modules."""

    def fetch(url: str, _w: int = width) -> str:
        import re

        m = re.search(r"/w(\d+)/p(\d+)$", url)
        i, j = int(m.group(1)), int(m.group(2))
        links = " ".join(
            f"[spark page](http://web.test/w{i + 1}/p{k})"
            for k in (j, (j + 1) % _w)
        )
        return f"# wave {i} page {j}\n\nspark content here. {links}\n"

    return fetch


def test_long_crawl_flat_slope_and_released_checkpoints(spark):
    """50-wave/10k-page crawl longevity (round-7 verdict #5): the BFS
    loop localCheckpoints visited per wave; without releasing wave N-1's
    pinned RDD, 50 superseded visited tables accumulate in executor
    storage, and driver-side plan growth would show as a rising per-wave
    wall. Pins both: (a) per-wave wall-time slope stays flat — the mean
    of the last 10 waves is bounded by a small multiple of the
    mid-crawl mean (not of the first waves, which pay JIT/codegen); (b)
    the persistent-RDD count returns to its pre-crawl level + exactly
    one (the final visited checkpoint)."""
    from ai_knowledge_etl_spark import pipeline as P

    sc = spark.sparkContext
    pinned_before = len(sc._jsc.getPersistentRDDs())

    seeds = spark.createDataFrame(
        [(f"http://web.test/w0/p{j}",) for j in range(_LONG_WIDTH)],
        "url string",
    )
    P._STAGE_CLOCK = []
    try:
        visited = P.crawl(
            spark,
            seeds,
            _make_long_web_fetcher(_LONG_WIDTH),
            "spark",
            max_depth=_LONG_WAVES,
        )
        n = visited.count()
        marks = list(P._STAGE_CLOCK)
    finally:
        P._STAGE_CLOCK = None

    # every wave discovered: WAVES+1 depths x WIDTH pages
    assert n == (_LONG_WAVES + 1) * _LONG_WIDTH

    waves = [b - a for (_, a), (_, b) in zip(marks, marks[1:])]
    assert len(waves) == _LONG_WAVES - 1
    mid = sorted(waves[5:15])
    tail = sorted(waves[-10:])
    mid_mean = sum(mid) / len(mid)
    tail_mean = sum(tail) / len(tail)
    # flat slope: linear visited growth (anti-join input) is expected to
    # cost a little; lineage/checkpoint accumulation would blow this up
    # (pre-release, superseded checkpoints grew storage linearly and the
    # driver replayed ever-deeper plans)
    assert tail_mean <= 2.0 * mid_mean + 0.25, (
        f"wave wall slope not flat: mid {mid_mean:.3f}s -> "
        f"tail {tail_mean:.3f}s over {_LONG_WAVES} waves"
    )

    # superseded per-wave checkpoints were released: at most the final
    # visited table (plus nothing else from this test) stays pinned
    pinned_after = len(sc._jsc.getPersistentRDDs())
    assert pinned_after <= pinned_before + 1, (
        f"pinned RDDs grew {pinned_before} -> {pinned_after}: "
        "superseded crawl checkpoints are accumulating"
    )
