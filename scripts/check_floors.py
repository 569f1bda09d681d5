"""Validate a bench run against FLOORS.json — the authoritative per-query
floor record (r8 verdict #7 consolidation).

Usage:
    python scripts/check_floors.py [bench_detail.json] [--update-new]

Prints the aggregate run/floor ratio, every cell above the --warn ratio
(default 1.8), and any name mismatch between the run and the floor table.
Exit status: 0 clean, 1 if any cell exceeds 2x its floor or the name sets
mismatch (new queries are reported, not fatal, unless a floor is MISSING
for a query the run timed and --update-new was not given).

--update-new adds queries present in the bench run but absent from
FLOORS.json at their current reading (the "enters at its first
measurement" convention BASELINE.md has used since r6), tagged with the
round from --round. Never touches existing floors: folds/resets are
deliberate edits with a reset-history entry.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", nargs="?", default=os.path.join(REPO, "BENCH_DETAIL.json"))
    ap.add_argument("--warn", type=float, default=1.8, help="report cells above this ratio")
    ap.add_argument("--update-new", action="store_true",
                    help="add first-measurement floors for queries missing from FLOORS.json")
    ap.add_argument("--round", default="r?", help="round tag for --update-new entries")
    args = ap.parse_args()

    with open(os.path.join(REPO, "FLOORS.json")) as f:
        doc = json.load(f)
    floors = {q: row["floor"] for q, row in doc["floors"].items()}
    with open(args.bench) as f:
        bench = json.load(f)
    run = bench["queries"] if "queries" in bench else bench

    common = sorted(set(run) & set(floors))
    new = sorted(set(run) - set(floors))
    gone = sorted(set(floors) - set(run))
    agg = sum(run[q] for q in common) / sum(floors[q] for q in common)
    print(f"{len(common)} common queries; aggregate run/floor = {agg:.3f}")

    bad = False
    for q in sorted(common, key=lambda q: -run[q] / floors[q]):
        r = run[q] / floors[q]
        if r >= args.warn:
            flag = " **>2x**" if r > 2.0 else ""
            print(f"  {q}: {run[q]:.2f}s vs floor {floors[q]:.2f} = {r:.2f}x{flag}")
            if r > 2.0:
                bad = True
    if new:
        print(f"queries without a floor: {new}")
        if args.update_new:
            for q in new:
                doc["floors"][q] = {
                    "floor": round(run[q], 2),
                    "entered": args.round,
                    "note": "first-measurement entry (check_floors --update-new)",
                }
            doc["floors"] = dict(sorted(doc["floors"].items()))
            with open(os.path.join(REPO, "FLOORS.json"), "w") as f:
                json.dump(doc, f, indent=1)
            print(f"added {len(new)} first-measurement floors")
        else:
            bad = True
    if gone:
        print(f"floors with no bench cell (retired queries?): {gone}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
