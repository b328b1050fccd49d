"""Named query assemblies wired into __spark_entry__.py.

Each module exposes:
    QUERIES: dict[str, Callable[(SparkSession, sf_dir: str), DataFrame]]
    ORACLES: dict[str, str]  — ANSI SQL DuckDB equivalents (omitted for
             genuinely non-SQL-expressible ops → driver does rows-only check)

Differential-testing conventions (driver compares row-count + schema +
order-insensitive value hash, columns sorted by name):
    - timestamps are returned as epoch-millis BIGINT, never TimestampType
      (timezone/precision proof);
    - every float aggregate is ROUND()ed to a fixed scale in BOTH dialects
      (summation order differs between engines; last-ulp noise is expected);
    - ranks/counts cast to BIGINT in both dialects;
    - every computed column aliased identically in both dialects.
"""

from . import llm_data, reference_queries, relational


def all_queries():
    out = {}
    for m in (reference_queries, relational, llm_data):
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in (reference_queries, relational, llm_data):
        out.update(m.ORACLES)
    return out
