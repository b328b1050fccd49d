#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully materialized via a count-style action (no driver-side
row transfer — we measure engine time, not toPandas serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the reference-surface pipelines + one representative of each
# operator family (join-heavy, analytic-window, dedup, similarity).
HEADLINE = [
    "hot_items_topn",
    "hot_media_tumbling_count",
    "session_window_count",
    "json_parse_project",
    "avg_value_by_type",
    "q3_shipping_priority",
    "asof_join_last_error",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "text_tfidf_top_terms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry
    from test_flink_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM/codegen paths once so the first measured query doesn't
    # pay JIT + classloading (we measure engine throughput, not startup).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([("w", 1.0)], "k STRING, v DOUBLE").groupBy("k").sum("v").collect()

    qs = entry.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        # warm the input cache path once? No — cold per query, like the driver.
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "sum_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
