"""North-star LLM-data-pipeline operators: dedup, similarity search,
text analysis, multimodal columns (BASELINE.json north_star).

Populated in build waves — see registry/crawl.py for parity conventions.
"""

from __future__ import annotations
