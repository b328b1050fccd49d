"""Relational operator pass-throughs (SURVEY.md §2.10): joins, set ops,
distinct/rollup/cube, analytic window functions, approximate aggregates —
absent from the reference, exposed so the engine surface is a superset.
Populated incrementally."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
