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

Round-9 hardening (r8 verdict item 8 + ADVICE):
  * ``current_round()`` counts only git-TRACKED CORRECTNESS files.  The
    driver drops CORRECTNESS_r{N}.json into the repo *after* the
    builder's round closes; that untracked artifact must not advance the
    gate's notion of "current" and redden a suite the builder can no
    longer amend.  (The artifact gets committed at the next round's
    start, which is exactly when the window must rotate.)
  * ``last_verified()`` discounts certificates that predate an
    implementation swap recorded in ``plans._REVERIFY`` — a certificate
    for a retired algorithm is not a certificate for its replacement.
  * ``--fill 0`` prints zero names (was falsy → full table).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _reverify() -> dict[str, int]:
    """plans._REVERIFY: query name -> round its implementation was swapped.
    Certificates from earlier rounds attest the retired algorithm and do
    not count.  Empty dict if plans cannot be imported (standalone use)."""
    sys.path.insert(0, REPO)
    try:
        from test_flink_spark.plans import _REVERIFY

        return dict(_REVERIFY)
    except Exception:
        return {}


def tracked_rounds() -> set[int]:
    """Round numbers of CORRECTNESS files tracked by git.  Untracked files
    are the driver's post-round drop — from a round the committed code
    never saw."""
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except Exception:
        # no git (exported tree): every file on disk counts
        out = "\n".join(
            os.path.basename(p)
            for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        )
    return {
        int(m.group(1))
        for m in (re.search(r"_r(\d+)", line) for line in out.splitlines())
        if m
    }


def current_round() -> int:
    """The round the _PROMOTED window will run in: one past the newest
    git-tracked CORRECTNESS artifact."""
    tracked = tracked_rounds()
    return (max(tracked) if tracked else 0) + 1


def last_verified() -> dict[str, int]:
    """query name -> latest round whose CORRECTNESS file shows a pass.
    Names never seen by the driver map to 0 (most stale).  Certificates
    older than a recorded implementation swap are discarded."""
    rounds: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"_r(\d+)", os.path.basename(f)).group(1))
        for name, res in json.load(open(f)).items():
            ok = bool(res.get("hash_match")) or (
                res.get("hash_match") is None and bool(res.get("rows_match"))
            )
            if ok:
                rounds[name] = max(rounds.get(name, 0), r)
    for name, swap_round in _reverify().items():
        if rounds.get(name, 0) < swap_round:
            rounds.pop(name, None)  # pre-swap certificate: void
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
    return ranked[:n] if n is not None else ranked


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fill", type=int, default=None, metavar="N",
                    help="print only the N stalest names, one per line")
    args = ap.parse_args()
    ranked = stalest()
    if args.fill is not None:
        for _, name in ranked[: args.fill]:
            print(f'    "{name}",')
        return
    hist = Counter(r for r, _ in ranked)
    print(f"window runs in round {current_round()} "
          f"(tracked CORRECTNESS rounds: {sorted(tracked_rounds())})")
    print("last-verified round histogram "
          "(0 = never driver-verified or voided by impl swap):",
          dict(sorted(hist.items())))
    for r, name in ranked:
        print(f"r{r:02d}  {name}")


if __name__ == "__main__":
    main()
