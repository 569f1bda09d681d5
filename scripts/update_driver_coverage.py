"""Merge the driver's per-round CORRECTNESS ledgers into DRIVER_COVERAGE.json.

The driver's correctness gate checks only the FIRST ~50 entries of
``__spark_entry__.queries()`` enumeration order each round, so the entry
module rotates: queries without a green driver row yet enumerate first.
Run this at the START of each round (after the driver wrote
CORRECTNESS_r{N}.json) so the rotation advances:

    python scripts/update_driver_coverage.py

A query counts as covered only if every recorded check in its row passed.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COV = os.path.join(REPO, "DRIVER_COVERAGE.json")


def main() -> None:
    try:
        with open(COV) as f:
            cov = json.load(f)
    except (OSError, ValueError):
        cov = {"covered": [], "rounds": {}}
    covered = set(cov.get("covered", []))
    ledgers = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if ledgers:
        cov["updated_from"] = os.path.basename(ledgers[-1])
    for path in ledgers:
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        with open(path) as f:
            ledger = json.load(f)
        green = sorted(
            name
            for name, row in ledger.items()
            if isinstance(row, dict)
            and all(v is True for k, v in row.items() if k.endswith("_match"))
            and row.get("err") in (None, "")
        )
        cov["rounds"][rnd] = green
        covered.update(green)
    cov["covered"] = sorted(covered)
    with open(COV, "w") as f:
        json.dump(cov, f, indent=1)
    print(f"covered: {len(cov['covered'])} queries across {len(cov['rounds'])} rounds")


if __name__ == "__main__":
    main()
