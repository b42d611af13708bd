#!/usr/bin/env python
"""The MANDATORY first commit of every round, automated (SURVEY §8.10,
amended round 9): regenerate `_LAST_GREEN_ROUND` from every
CORRECTNESS_r*.json on disk and splice it into registry.py IN PLACE,
then report the tier-0 (never-green / changed-oracle) queries so the
builder can decide what to pin into a `_PRIORITY_R{N}` front-list.

Why this exists: the correctness file for round N lands AFTER round
N's final snapshot commit, so any regen done DURING round N is one
round stale at hand-off — the next driver sweep then re-checks the
previous round's exact ~50 queries while never-checked queries starve
(this burned rounds 6→7 and 8→9). Running this FIRST each round is
the only ordering that spends the sweep budget where the signal is
oldest.

Usage:
    python tools/start_round.py          # splice + report
    python tools/start_round.py --check  # report only, no write

After running: DELETE the map entries of any query whose semantics or
oracle you change during the round (the escape hatch that sends it
back to tier 0), retire the previous round's `_PRIORITY_R*` list, and
pin anything the ~50-query budget MUST reach this round.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REGISTRY = REPO / "dataengineeringproject_spark" / "registry.py"

sys.path.insert(0, str(REPO / "tools"))
from gen_sweep_tiers import latest_green  # noqa: E402


def render_map(last: dict[str, int]) -> str:
    rounds = sorted(set(last.values()))
    out = ["_LAST_GREEN_ROUND: dict[str, int] = {"]
    for rnd in rounds:
        names = sorted(n for n, v in last.items() if v == rnd)
        out.append(
            f"    # --- round {rnd} is the newest green driver row"
            f" ({len(names)} queries)"
        )
        out.extend(f'    "{n}": {rnd},' for n in names)
    out.append("}")
    return "\n".join(out) + "\n"


def splice(new_map: str) -> None:
    src = REGISTRY.read_text()
    start = src.index("_LAST_GREEN_ROUND: dict[str, int] = {")
    end = src.index("\n}\n", start) + len("\n}\n")
    REGISTRY.write_text(src[:start] + new_map + src[end:])


def registered_names() -> list[str]:
    """Registered query names WITHOUT importing pyspark (greps the
    @register calls so this tool runs in under a second)."""
    names = []
    for f in (REPO / "dataengineeringproject_spark" / "queries").glob("*.py"):
        names.extend(
            re.findall(r'@register\(\s*\n?\s*"([a-z0-9_]+)"', f.read_text())
        )
    return names


def spent_pin_lists(
    correctness_path=None, registry_src=None
) -> list[tuple[str, list[str]]]:
    """ADVICE r9: detect _PRIORITY_R* lists whose every entry is green
    in the newest CORRECTNESS file — they are spent and must be retired
    (a stale pin list re-burns the sweep budget on already-green rows).

    Both inputs are injectable so tests run on synthetic fixtures only
    (VERDICT r10 item 1: asserting live repo state goes red the moment
    the driver delivers the next CORRECTNESS file)."""
    import json

    if correctness_path is None:
        files = sorted(REPO.glob("CORRECTNESS_r*.json"))
        if not files:
            return []
        correctness_path = files[-1]
    latest = json.loads(Path(correctness_path).read_text())
    green = {
        n for n, row in latest.items()
        if row.get("rows_match") and row.get("err") is None
    }
    src = registry_src if registry_src is not None else REGISTRY.read_text()
    spent = []
    for m in re.finditer(
        r"^(_PRIORITY_R\d+): list\[str\] = \[(.*?)\]", src, re.S | re.M
    ):
        names = re.findall(r'"([a-z0-9_]+)"', m.group(2))
        if names and all(n in green for n in names):
            spent.append((m.group(1), names))
    return spent


if __name__ == "__main__":
    check_only = "--check" in sys.argv
    last = latest_green()
    if not check_only:
        splice(render_map(last))
        print(f"spliced {len(last)} entries into {REGISTRY}")
    names = registered_names()
    tier0 = [n for n in names if n not in last]
    print(f"registered (grep): {len(names)}; green-ever: {len(last)}; "
          f"tier 0 (never green): {len(tier0)}")
    for n in tier0:
        print("  tier0:", n)
    stale = sorted(last.items(), key=lambda kv: kv[1])[:10]
    print("10 stalest green rows:")
    for n, r in stale:
        print(f"  r{r}: {n}")
    for name, names in spent_pin_lists():
        print(
            f"\nWARNING: {name} is SPENT — all {len(names)} entries are "
            "green in the newest CORRECTNESS file. Retire it now or the "
            "sweep budget re-checks them ahead of stale/never-checked rows."
        )
    print(
        "\nNEXT: retire the old _PRIORITY_R* list; pin must-reach "
        "queries; DELETE map entries for any oracle you change."
    )
