#!/usr/bin/env python3
"""Capture .explain('formatted') output for registered queries.

Usage: python tools/capture_plan.py SUFFIX NAME [NAME ...]
Writes plans/r12/<name>_<SUFFIX>.txt for each query.  SUFFIX is
'before' or 'after'.  Planning only — no job is executed (except the
driver-side work a query function itself performs, e.g. k-means
training collects; those run as they would under the bench).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from test_flink_spark.session import get_spark

    spark = get_spark("capture-plan")
    qs = entry.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
