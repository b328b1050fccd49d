"""Scalar-function helpers (SURVEY.md §2.2): JSON/CSV parsing, epoch
normalization, result formatting.  All JVM-side built-ins — no Python UDFs in
the hot path (whole-stage codegen keeps these fused)."""
