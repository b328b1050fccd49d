#!/usr/bin/env python3
"""Name-wise, host-calibrated bench diff between two BENCH snapshots
(r9 verdict item 5).

``bench.py`` records per-query seconds positionally (``qt[i]`` belongs to
``sorted(queries().keys())[i]`` of the registry THAT RAN), so comparing
two rounds requires each round's own name list — which
tools/compare_bench.py only has for the current registry.  This tool
recovers the historical list from git:

1. Find the commit that ADDED the BENCH artifact (the driver commits it
   at round close); the registry that ran is the repo state at that
   commit (falling back to its parent if the import or fingerprint
   fails there).
2. ``git archive`` that tree into a temp dir and import its
   ``__spark_entry__.queries()`` in a subprocess; the md5 fingerprint of
   the sorted names must equal the snapshot's recorded ``qt_fp`` —
   positional decode is only trusted when the fingerprint PROVES the
   name list.  Results are cached in tools/.registry_cache.json keyed by
   qt_fp, so each historical registry is reconstructed once.
3. Diff name-wise.  Driver sweeps land in different host phases
   (BASELINE.md documents +15-70% swings on untouched code), so raw
   deltas mislead: the calibration factor is the MEDIAN new/old ratio
   over common lines (most lines are untouched in any round, so the
   median ratio IS the host-phase signature), and a mover is a line
   whose ratio exceeds the threshold AFTER dividing out that median.

Usage:
    python tools/bench_diff.py BENCH_r08.json BENCH_r09.json
    python tools/bench_diff.py old.json new.json --threshold 1.5 --min-sec 0.3
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "tools", ".registry_cache.json")


def _load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    return doc["parsed"] if "parsed" in doc else doc


def _fp(names: list[str]) -> str:
    return hashlib.md5("|".join(names).encode()).hexdigest()[:8]


def _cache() -> dict:
    try:
        with open(CACHE) as f:
            return json.load(f)
    except Exception:
        return {}


def _names_at_commit(commit: str) -> list[str] | None:
    """sorted(queries().keys()) of the repo tree at ``commit``, imported
    in a subprocess from a ``git archive`` extraction (no checkout)."""
    with tempfile.TemporaryDirectory() as td:
        tar = subprocess.run(
            ["git", "archive", commit], cwd=REPO, capture_output=True
        )
        if tar.returncode != 0:
            return None
        subprocess.run(["tar", "-x"], cwd=td, input=tar.stdout, check=True)
        got = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys, json; sys.path.insert(0, '.');"
                "import __spark_entry__ as e;"
                "print(json.dumps(sorted(e.queries().keys())))",
            ],
            cwd=td,
            capture_output=True,
            text=True,
        )
    if got.returncode != 0:
        return None
    return json.loads(got.stdout.strip().splitlines()[-1])


def registry_for(bench_path: str, doc: dict) -> list[str] | None:
    """Name list proven (by qt_fp) to match the snapshot's qt positions."""
    want_fp = doc.get("qt_fp")
    if want_fp is None:
        return None
    cache = _cache()
    if want_fp in cache:
        return cache[want_fp]
    # current registry first — free when the snapshot is this round's
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    names = sorted(e.queries().keys())
    if _fp(names) != want_fp:
        rel = os.path.relpath(os.path.abspath(bench_path), REPO)
        adds = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--", rel],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.split()
        names = None
        for base in adds:
            for commit in (base, f"{base}^"):
                cand = _names_at_commit(commit)
                if cand is not None and _fp(cand) == want_fp:
                    names = cand
                    break
            if names:
                break
    if names is None:
        return None
    cache[want_fp] = names
    with open(CACHE, "w") as f:
        json.dump(cache, f)
    return names


def name_times(bench_path: str) -> tuple[dict, dict[str, float]]:
    doc = _load(bench_path)
    qt = doc.get("qt")
    names = registry_for(bench_path, doc) if qt is not None else None
    if names is not None and len(names) == len(qt):
        timed = dict(zip(names, qt))
    else:
        timed = dict(doc.get("queries", {}))
        print(
            f"# {bench_path}: could not prove a registry for qt_fp="
            f"{doc.get('qt_fp')}; using itemized slowest-lines map only",
            file=sys.stderr,
        )
    return doc, timed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold",
        type=float,
        default=1.5,
        help="calibrated ratio above which a line is a mover",
    )
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.3,
        help="ignore lines under this many seconds in BOTH rounds (timer noise)",
    )
    args = ap.parse_args()
    odoc, oq = name_times(args.old)
    ndoc, nq = name_times(args.new)
    common = sorted(set(oq) & set(nq))
    # oq[k] > 0 guard: a 0.0 s old line (sub-ms rounding) would raise
    # ZeroDivisionError and its ratio is meaningless anyway
    ratios = [
        nq[k] / oq[k]
        for k in common
        if oq[k] > 0 and (oq[k] >= args.min_sec or nq[k] >= args.min_sec)
    ]
    cal = statistics.median(ratios) if ratios else 1.0
    print(
        f"total {odoc.get('value')} -> {ndoc.get('value')} s | "
        f"eps {odoc.get('stream_eps')} -> {ndoc.get('stream_eps')} | "
        f"common lines {len(common)} | host calibration x{cal:.2f} "
        f"(median common-line ratio)"
    )
    movers = []
    zero_old = []
    for k in common:
        if max(oq[k], nq[k]) < args.min_sec:
            continue
        if oq[k] <= 0:  # ratio undefined; report alongside new-only lines
            zero_old.append(k)
            continue
        r = (nq[k] / oq[k]) / cal
        if r >= args.threshold or r <= 1 / args.threshold:
            movers.append((r, k))
    for r, k in sorted(movers, reverse=True):
        tag = "SLOWER" if r > 1 else "faster"
        print(f"x{r:5.2f} {tag}  {k}: {oq[k]} -> {nq[k]} s (calibrated)")
    if not movers:
        print(f"(no calibrated movers beyond x{args.threshold})")
    if zero_old:
        print("zero-old (no ratio):", ", ".join(f"{k}->{nq[k]}s" for k in zero_old))
    new_only = sorted((k for k in nq if k not in oq), key=lambda k: -nq[k])
    if new_only:
        print("new:", ", ".join(f"{k}={nq[k]}" for k in new_only[:12]))
    gone = sorted(k for k in oq if k not in nq)
    if gone:
        print("dropped/renamed:", ", ".join(gone[:12]))


if __name__ == "__main__":
    main()
