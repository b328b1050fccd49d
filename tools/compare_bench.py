#!/usr/bin/env python3
"""Round-over-round bench diff: compare two BENCH_r{N}.json files (driver
wrapper format with a ``parsed`` blob, or a bare bench.py JSON line) and
print per-query deltas, sorted by regression size.

Usage: python tools/compare_bench.py BENCH_r02.json BENCH_r03.json [--min 0.3]
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:  # driver wrapper
        doc = doc["parsed"]
    # r5+ format: "queries" holds only the slowest lines; "qt" carries a
    # time for EVERY registered query, positionally ordered by
    # sorted(queries().keys()).  Reconstruct the full name->sec map from
    # the CURRENT registry when the lengths line up (names drift across
    # rounds; a mismatched length means the registry changed since that
    # bench ran — fall back to the itemized map).
    if "qt" in doc:
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __spark_entry__ as entry

        names = sorted(entry.queries())
        # Prefer the fingerprint when present (r6+): it proves the qt
        # positions belong to THIS name list.  Length-only matching can
        # silently mis-attribute after a rename or add+remove.
        import hashlib

        fp = hashlib.md5("|".join(names).encode()).hexdigest()[:8]
        recorded_fp = doc.get("qt_fp")
        fp_ok = recorded_fp == fp if recorded_fp is not None else True
        if fp_ok and len(names) == len(doc["qt"]):
            full = dict(zip(names, doc["qt"]))
            full.update(doc.get("queries", {}))  # keep shared-stage lines
            doc = {**doc, "queries": full}
        elif not fp_ok:
            print(
                f"# qt_fp mismatch ({recorded_fp} != {fp}): registry changed "
                "since that bench ran — using itemized map only",
                file=sys.stderr,
            )
    return doc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min", type=float, default=0.3, help="min |delta| sec to print")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(
        f"total: {old.get('value')} -> {new.get('value')} sec | "
        f"stream_eps: {old.get('stream_eps')} -> {new.get('stream_eps')} | "
        f"queries timed: {len(oq)} -> {len(nq)}"
    )
    both = sorted(set(oq) & set(nq), key=lambda k: (nq[k] - oq[k]), reverse=True)
    shown = 0
    for k in both:
        d = nq[k] - oq[k]
        if abs(d) >= args.min:
            print(f"{'+' if d > 0 else ''}{d:6.2f}s  {k}: {oq[k]} -> {nq[k]}")
            shown += 1
    only_new = sorted(set(nq) - set(oq), key=lambda k: -nq[k])
    if only_new:
        print("new queries:", ", ".join(f"{k}={nq[k]}" for k in only_new[:10]))
    only_old = sorted(set(oq) - set(nq))
    if only_old:
        print("dropped/folded:", ", ".join(only_old[:10]))
    if not shown:
        print(f"(no per-query deltas >= {args.min}s)")


if __name__ == "__main__":
    main()
