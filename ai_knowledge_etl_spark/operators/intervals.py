"""Banded interval-overlap join — the general range join Catalyst has no
physical strategy for (a naive inequality condition degrades to a per-key
nested-loop cross product).

Rewrite: bin BOTH sides into fixed `width` buckets; each interval explodes
into the buckets it covers (bounded by ceil(max_len/width)+1, never
data-dependent); equi-join on (key, bucket); residual overlap filter
(a.start < b.end AND b.start < a.end); and keep a pair only in the FIRST
bucket the two intervals share — bucket == greatest(floor(a0/W),
floor(b0/W)) — so every overlapping pair matches EXACTLY once with no
distinct pass. tests/test_interval_properties.py proves equivalence to the
brute-force join on random interval sets.

At scale the equi-join hash-partitions on (key, bucket) and
whole-stage-codegens; `width` trades fan-out (intervals spanning many
buckets) against bucket density (many intervals per bucket) — set it
near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bins(lo: Column, hi: Column, width: int) -> Column:
    """Distinct bucket ids covered by [lo, hi) — inclusive of hi's bucket
    (an interval touching a bucket boundary still overlaps candidates
    binned there)."""
    return F.array_distinct(
        F.sequence(F.floor(lo / width), F.floor(hi / width))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    width: int,
) -> DataFrame:
    """All (left, right) row pairs with equal `key` whose half-open
    intervals overlap; each pair appears exactly once. Column names must
    be disjoint apart from `key` (right's key is matched then dropped)."""
    l0, l1 = left_bounds
    r0, r1 = right_bounds
    lb = left.withColumn(
        "__bin", F.explode(_bins(F.col(l0), F.col(l1), width))
    )
    rk = f"__rk_{key}"
    rb = right.withColumnRenamed(key, rk).withColumn(
        "__rbin", F.explode(_bins(F.col(r0), F.col(r1), width))
    )
    joined = lb.join(
        rb,
        (lb[key] == rb[rk])
        & (lb["__bin"] == rb["__rbin"])
        & (lb[l0] < rb[r1])
        & (rb[r0] < lb[l1])
        & (
            lb["__bin"]
            == F.greatest(F.floor(lb[l0] / width), F.floor(rb[r0] / width))
        ),
    )
    return joined.drop("__bin", "__rbin", rk)
