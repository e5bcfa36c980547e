"""Relational operators over the star schema (SURVEY §2.D/E/F/G/H).

TPC-H-style joins/aggregates/windows stand in for the reference's
links ⋈ pages ⋈ visited workload at scale (FIXTURES.md). Populated in
build waves — see registry/crawl.py for the parity conventions.
"""

from __future__ import annotations
