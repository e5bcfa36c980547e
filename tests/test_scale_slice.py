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
