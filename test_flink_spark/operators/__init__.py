"""Reusable DataFrame operators mirroring SURVEY.md §2 plus the north-star
LLM-data-pipeline operators.  Every operator:

- takes and returns DataFrames (composable, batch/stream where possible);
- is declarative (Catalyst plans the physical strategy);
- avoids driver-side collects and per-row Python;
- defines deterministic tie-breakers instead of relying on ordering
  (the reference relies on parallelism=1; we must not — SURVEY.md §2.9 E2).
"""
