"""Event-time / iterative dataflow operators (SURVEY §2.J).

Populated in build waves — see registry/crawl.py for parity conventions.
"""

from __future__ import annotations
