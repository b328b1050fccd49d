#!/usr/bin/env python3
"""Spark-side scale probe at the synthetic sf1 (tools/make_sf1.py output)
— or any other scale dir via SPARK_GRAFT_PROBE_SF (e.g. /root/repo/.sf10
for the 100x second-decade probe): times each named query end-to-end
through the noop sink in one fresh session per query, with a per-query
wall budget so a quadratic blowup is RECORDED (as TIMEOUT) instead of
hanging the probe.  Usage:
    [SPARK_GRAFT_PROBE_SF=/root/repo/.sf10] \
        python tools/sf1_probe.py [--budget SEC] name...
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF1 = os.environ.get("SPARK_GRAFT_PROBE_SF", "/root/repo/.sf1")


def _run(name: str, q):
    import __spark_entry__ as entry
    from test_flink_spark.session import get_spark

    spark = get_spark("sf1-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    try:
        entry.queries()[name](spark, SF1).write.format("noop").mode(
            "overwrite"
        ).save()
        q.put(("ok", round(time.perf_counter() - t0, 2)))
    except Exception as e:  # noqa: BLE001
        q.put(("error", f"{type(e).__name__}: {e}"[:200]))


def main() -> None:
    args = sys.argv[1:]
    budget = 600.0
    if args and args[0] == "--budget":
        budget = float(args[1])
        args = args[2:]
    for name in args:
        q = mp.Queue()
        p = mp.Process(target=_run, args=(name, q))
        t0 = time.perf_counter()
        p.start()
        p.join(timeout=budget)
        if p.is_alive():
            p.terminate()
            p.join()
            print(json.dumps({"name": name, "status": "TIMEOUT",
                              "budget_sec": budget}), flush=True)
            continue
        status, val = q.get() if not q.empty() else ("error", "no result")
        rec = {"name": name, "status": status}
        if status == "ok":
            rec["sec"] = val
        else:
            rec["detail"] = val
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
