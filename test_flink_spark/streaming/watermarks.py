"""Watermark helpers (SURVEY.md §2.4 W1-W3).

Reference semantics: ``AscendingTimestampExtractor`` — watermark = max seen
event time − 1 ms, no allowed lateness (HotMediaTrack.java:79-84;
HotItemAnalysis.java:94-99).  Spark: ``withWatermark(col, delay)`` where
watermark = max event time − delay, advanced per micro-batch.  Delay "0
seconds" reproduces the ascending assumption (the documented 1 ms off-by-one
is a non-chase: both engines close window W when watermark ≥ W.end —
SURVEY.md §4.3).

W3 (late-data handling) is the engine's knob the reference lacks: a larger
``allowed_lateness`` keeps window state open longer — the direct analogue of
Flink's allowedLateness, spelled as a bigger watermark delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ascending_watermark(df: DataFrame, ts_col: str) -> DataFrame:
    """W1/W2: in-order input assumption, no lateness tolerance."""
    return df.withWatermark(ts_col, "0 seconds")


def bounded_lateness_watermark(df: DataFrame, ts_col: str, lateness: str) -> DataFrame:
    """W3: tolerate out-of-order events up to ``lateness`` (e.g. '10 minutes').
    State for a window is kept until watermark passes window_end + lateness."""
    return df.withWatermark(ts_col, lateness)
