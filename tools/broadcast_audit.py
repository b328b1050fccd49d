#!/usr/bin/env python3
"""Audit every explicit F.broadcast hint in the registered query fleet for
scale growth: build each query at sf0.001 and sf0.01 with a spy wrapped
around pyspark.sql.functions.broadcast, count the rows of every hinted
relation at both scales, and report the growth ratio.

A broadcast hint is scale-safe only if the hinted relation's cardinality
does NOT grow with input scale (dims, scalar aggregates, vocabulary /
k-row tables).  A hint whose relation grows ~linearly (per-document /
per-user tables) is the bug class the r4 verdict flagged in
sparse_cosine_topk: fine at sf0.1, dead at 100 TB.

Usage: python tools/broadcast_audit.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sf0.001 -> sf0.01 is the WRONG probe pair: documents/embeddings are flat
# across it (500 rows at both) and per-document hints escape detection —
# exactly how the original sparse_cosine_topk norms broadcast survived four
# rounds.  sf0.01 -> sf0.1 scales every table (tpch/events 10x, documents
# 10x, embeddings 4x).
SF_A = "/root/testdata/sf0.01"
SF_B = "/root/testdata/sf0.1"


def collect_hints(entry, spark, names):
    import pyspark.sql.functions as SF

    real = SF.broadcast
    out = {}  # name -> list[(count_a, count_b)]
    for name in names:
        fn = entry.queries()[name]
        per_sf = []
        for sf in (SF_A, SF_B):
            rec = []

            def spy(df, _rec=rec, _real=real):
                _rec.append(df)
                return _real(df)

            SF.broadcast = spy
            try:
                fn(spark, sf)
            finally:
                SF.broadcast = real
            per_sf.append([df.count() for df in rec])
        a, b = per_sf
        if len(a) != len(b):
            out[name] = [("HINT-COUNT-MISMATCH", a, b)]
        elif a:
            out[name] = list(zip(a, b))
    return out


def main():
    from test_flink_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("broadcast-audit", master="local[8]", shuffle_partitions=8)
    names = sys.argv[1:] or list(entry.queries())
    res = collect_hints(entry, spark, names)
    grow = 0
    for name, pairs in sorted(res.items()):
        for i, pair in enumerate(pairs):
            if pair[0] == "HINT-COUNT-MISMATCH":
                print(f"MISMATCH {name}: {pair[1]} vs {pair[2]}")
                continue
            a, b = pair
            ratio = (b / a) if a else float("inf") if b else 1.0
            flag = "GROWS" if b > 3 * a + 20 else "ok"
            if flag == "GROWS":
                grow += 1
            print(f"{flag:6s} {name} hint#{i}: small={a} big={b} x{ratio:.1f}  ({SF_A} -> {SF_B})")
    print(f"\n{grow} growing hints")


if __name__ == "__main__":
    main()
