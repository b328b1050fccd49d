"""North-star LLM-data-pipeline queries (BASELINE.json): dedup, similarity
search, text analysis, multimodal columns.  Populated incrementally."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
