"""Queries replicating the reference's own pipelines over the driver's
``events`` table (FIXTURES.md §3 mapping: ``event_type`` plays behavior/type,
``ts`` the event-time column, ``user_id`` the item/app grouping key).

Coverage (SURVEY.md §2): S3 (file source), P1-P4, F1, K1/K2, WIN1/WIN2,
A1/A2/A3, T1, O1/O2, plus session windows (§2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topn import top_n_by_count
from ..operators.windows import session_count, sliding_count, tumbling_count
from ..operators.fanout import fan_out
from ..schemas import load_table
from ..session import apply_runtime_confs


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Flagship: HotItemAnalysis batch replica (SURVEY.md §7 phase 0).
# filter pv (F1) → keyBy item (K2) → sliding 1h/5min count (WIN2+A1+A3)
# → re-key by windowEnd (K2) → Top-3 (T1/O1/O2), deterministic tie-break.
# ---------------------------------------------------------------------------

def hot_items_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HotItemAnalysis.java:103-108 replica: Top-3 'view' users per sliding
    window.  Two shuffles (counts, rank) — same exchange structure as the
    reference's two keyBys (SURVEY.md §3.2)."""
    pv = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    counts = sliding_count(pv, "ts", ["user_id"], "1 hour", "5 minutes")
    ranked = top_n_by_count(counts, ["window_end"], "cnt", ["user_id"], n=3)
    return ranked.select(
        F.col("window_end"),
        F.col("rank").cast("long").alias("rank"),
        F.col("user_id"),
        F.col("cnt"),
    )


_HOT_ITEMS_SQL = """
WITH pv AS (
    SELECT user_id, epoch_ms(ts) AS tms FROM events WHERE event_type = 'view'
), wins AS (
    SELECT user_id, ((tms // 300000) + j) * 300000 AS window_end
    FROM pv CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS j)
), counts AS (
    SELECT window_end, user_id, COUNT(*) AS cnt FROM wins GROUP BY 1, 2
), ranked AS (
    SELECT window_end, user_id, cnt,
           ROW_NUMBER() OVER (PARTITION BY window_end
                              ORDER BY cnt DESC, user_id ASC) AS rank
    FROM counts
)
SELECT window_end, rank, user_id, cnt FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# HotMediaTrack batch replica: tumbling 30 s count per (appid, type) —
# K1 + WIN1 + A1 + A3 (HotMediaTrack.java:88-90).
# ---------------------------------------------------------------------------

def hot_media_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return tumbling_count(df, "ts", ["user_id", "event_type"], "30 seconds").select(
        "user_id", "event_type", "window_end", "cnt"
    )


_HOT_MEDIA_SQL = """
SELECT user_id, event_type,
       ((epoch_ms(ts) // 30000) + 1) * 30000 AS window_end,
       COUNT(*) AS cnt
FROM events
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# P1: JSON projection (TextToBean, HotMediaTrack.java:174-207) over the
# events.props JSON column; aggregate so the oracle compare is compact.
# ---------------------------------------------------------------------------

def json_parse_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    parsed = df.select(
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
        F.col("value"),
    )
    return parsed.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        # value is 2-decimal: the exact cent sum IS ROUND(SUM(value), 4)
        F.expr(
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0"
        ).alias("sum_value"),
    )


_JSON_PARSE_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# F1: equality filter (HotItemAnalysis.java:103) + per-key count.
# ---------------------------------------------------------------------------

def filter_count_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return (
        df.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_FILTER_SQL = """
SELECT user_id, COUNT(*) AS cnt FROM events WHERE event_type = 'view' GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A2: average aggregate (AverageAgg, HotItemAnalysis.java:139-160 — unused in
# the reference but part of its surface).  avg == sum/count algebra.
# ---------------------------------------------------------------------------

def avg_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return df.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.count(F.lit(1)).alias("cnt"),
    )


_AVG_SQL = """
SELECT event_type, ROUND(AVG(value), 4) AS avg_value, COUNT(*) AS cnt
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# P2: CSV line parse (HotItemAnalysis.java:83-93).  Round-trip: format events
# as " , "-padded CSV lines, parse back with from_csv (split+trim+cast), agg.
# ---------------------------------------------------------------------------

def csv_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.parsing import epoch_seconds_to_ts  # noqa: F401  (P3 helper)

    df = _events(spark, sf_dir)
    # a single-file parquet corpus arrives as ONE split, and everything
    # here (format_string + regexp + from_csv) is compute-bound: fan out
    # before the parse or it runs on one core (measured 5.5 s -> 0.3 s at
    # sf0.1; same rule as repetition_scores/shingles)
    df = fan_out(df)
    lines = df.select(
        F.format_string("%d , %s , %d", "user_id", "event_type", "event_id").alias("value")
    )
    cleaned = F.regexp_replace(F.trim(F.col("value")), r"\s*,\s*", ",")
    parsed = lines.select(
        F.from_csv(cleaned, "user_id BIGINT, behavior STRING, event_id BIGINT").alias("c")
    ).select("c.*")
    return parsed.groupBy("behavior").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("user_id").alias("sum_user")
    )


_CSV_SQL = """
SELECT event_type AS behavior, COUNT(*) AS cnt,
       CAST(SUM(user_id) AS BIGINT) AS sum_user
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Session windows (§2.10 — absent from reference, engine superset).
# Spark semantics: events merge while gap < 30 min (strict).
# ---------------------------------------------------------------------------

def session_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return session_count(df, "ts", ["user_id"], gap="30 minutes").select(
        "user_id", "session_start", "cnt"
    )


_SESSION_SQL = """
WITH e AS (
    SELECT user_id, epoch_ms(ts) AS tms FROM events
), marked AS (
    SELECT user_id, tms,
           CASE WHEN tms - LAG(tms) OVER w >= 1800000
                  OR LAG(tms) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_s
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY tms)
), sessions AS (
    SELECT user_id, tms,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT user_id, MIN(tms) AS session_start, COUNT(*) AS cnt
FROM sessions GROUP BY user_id, sid
"""


QUERIES = {
    "hot_items_topn": hot_items_topn,
    "hot_media_tumbling_count": hot_media_tumbling_count,
    "json_parse_project": json_parse_project,
    "filter_count_by_user": filter_count_by_user,
    "avg_value_by_type": avg_value_by_type,
    "csv_parse_roundtrip": csv_parse_roundtrip,
    "session_window_count": session_window_count,
}

ORACLES = {
    "hot_items_topn": _HOT_ITEMS_SQL,
    "hot_media_tumbling_count": _HOT_MEDIA_SQL,
    "json_parse_project": _JSON_PARSE_SQL,
    "filter_count_by_user": _FILTER_SQL,
    "avg_value_by_type": _AVG_SQL,
    "csv_parse_roundtrip": _CSV_SQL,
    "session_window_count": _SESSION_SQL,
}
