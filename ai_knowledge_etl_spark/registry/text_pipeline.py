"""Text-pipeline operators (SURVEY §2.I): chunking, structure, summaries.

Populated in build waves — see registry/crawl.py for parity conventions.
"""

from __future__ import annotations
