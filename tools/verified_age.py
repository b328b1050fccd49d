"""Map each registered query to the round it was last driver-verified.

The driver verifies the first 50 registered queries per round
(CORRECTNESS_r{N}.json); ``plans.__init__._PROMOTED`` controls that
window.  Union coverage reached 268/268 in round 7, but a query verified
once and never rotated back in can silently rot: shared-stage
refactors (e.g. the round-7 pair-base memoization) touch consumers whose
last driver check predates the change.  This tool is the rotation's
feedback loop (round-7 verdict item 2):

    python tools/verified_age.py            # staleness table + histogram
    python tools/verified_age.py --fill 14  # print the 14 stalest names
                                            #   (paste into _PROMOTED)

The companion gate ``tests/test_plans.py::test_promotion_window_rotates_stalest``
asserts every _PROMOTED slot not taken by a new-this-round query is spent
on names from the stalest cohort, so the window can never idle on
already-fresh queries.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_verified() -> dict[str, int]:
    """query name -> latest round whose CORRECTNESS file shows a pass.
    Names never seen by the driver map to 0 (most stale)."""
    rounds: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"_r(\d+)", os.path.basename(f)).group(1))
        for name, res in json.load(open(f)).items():
            ok = bool(res.get("hash_match")) or (
                res.get("hash_match") is None and bool(res.get("rows_match"))
            )
            if ok:
                rounds[name] = max(rounds.get(name, 0), r)
    return rounds


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    return list(e.queries().keys())


def stalest(n: int | None = None) -> list[tuple[int, str]]:
    seen = last_verified()
    ranked = sorted(
        (seen.get(name, 0), name) for name in registry_names()
    )
    return ranked[:n] if n else ranked


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fill", type=int, default=None, metavar="N",
                    help="print only the N stalest names, one per line")
    args = ap.parse_args()
    ranked = stalest()
    if args.fill:
        for _, name in ranked[: args.fill]:
            print(f'    "{name}",')
        return
    hist = Counter(r for r, _ in ranked)
    print("last-verified round histogram "
          "(0 = never driver-verified):", dict(sorted(hist.items())))
    for r, name in ranked:
        print(f"r{r:02d}  {name}")


if __name__ == "__main__":
    main()
