"""PII redaction + text normalization for training corpora: regex-based
scrubbing of emails / phone numbers / IPv4 addresses / SSN-shaped ids, plus
whitespace normalization — the standard pre-training hygiene pass.

Scale design: the whole operator is a chain of JVM-side ``regexp_replace`` /
``regexp_extract_all`` expressions — no UDF, no shuffle, fully
whole-stage-codegen'd, and it pipelines with any downstream filter in the
same stage.  At 100 TB this runs at scan speed.

Pattern notes: every regex sticks to the syntax subset shared by Java
(Spark) and RE2 (DuckDB oracle) — character classes, bounded repeats,
non-capturing groups, ``\b`` — so the differential test replays the exact
same automaton in both engines.  Patterns are applied in a fixed order
(SSN before phone: ``123-45-6789`` must not be half-eaten by the looser
phone pattern after SSN redaction removes it first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, regex, replacement) — order is the application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\(\d{3}\) \d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII scrub: counts each pattern on the ORIGINAL text
    (counts are independent diagnostics, not order-dependent), redacts
    sequentially, then collapses runs of whitespace.

    Returns ``(id_col, clean_text, n_<pattern>..., total_redactions)``."""
    t = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }
    clean: Column = t
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("total_redactions"),
    )


def redact_oracle_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`redact_pii` over ``text_expr``:
    keys ``clean_text``, ``n_<pattern>``, ``total_redactions``.  DuckDB's
    ``regexp_replace`` needs the explicit ``'g'`` flag (Spark replaces all
    matches by default)."""
    clean = text_expr
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    clean = f"trim(regexp_replace({clean}, '\\s+', ' ', 'g'))"
    counts = {
        f"n_{name}": f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
        for name, pat, _ in PII_PATTERNS
    }
    total = " + ".join(counts.values())
    return {"clean_text": clean, **counts, "total_redactions": f"({total})"}
