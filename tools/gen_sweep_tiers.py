#!/usr/bin/env python
"""Regenerate registry._LAST_GREEN_ROUND from CORRECTNESS_r0*.json.

Run at the start of each round, paste the output into
dataengineeringproject_spark/registry.py, then DELETE the entries of any
query whose semantics or oracle you change during the round (the
escape hatch that sends it back to the front of the sweep queue).
A query counts as green in a round if its row hash-matched, or (for
rows-only exemptions) row-counted with no error.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def latest_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        for name, row in json.loads(f.read_text()).items():
            if row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            ):
                last[name] = rnd
    return last


if __name__ == "__main__":
    last = latest_green()
    rounds = sorted(set(last.values()))
    print("_LAST_GREEN_ROUND: dict[str, int] = {")
    for rnd in rounds:
        names = sorted(n for n, v in last.items() if v == rnd)
        print(
            f"    # --- round {rnd} is the newest green driver row"
            f" ({len(names)} queries)"
        )
        for n in names:
            print(f'    "{n}": {rnd},')
    print("}")
