#!/usr/bin/env python
"""Physical-plan audit over EVERY registered query (DEPLOY.md claims):

1. zero `BatchEvalPython` (row-at-a-time Python) anywhere — Python is
   allowed only as Arrow-batched exec (ArrowEvalPython,
   FlatMapGroupsInPandas, MapInPandas, FlatMapGroupsInPandasWithState);
2. every parquet scan of a WIDE table (>= WIDE_THRESHOLD columns)
   prunes columns: the scan's ReadSchema must be strictly narrower than
   the file schema, unless the query is in _FULL_WIDTH_OK (returns
   whole rows by design, so a full-width read is the correct plan).

Run: python tools/audit_plans.py   (sf0.001; streaming queries execute
their micro-batch runs as part of plan construction, so this takes a
few minutes). Exits non-zero on violation. The per-query plan-snapshot
tests pin the sharper per-plan properties; this is the fleet-wide
sweep run before each round's hand-off.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"
WIDE_THRESHOLD = 8  # lineitem=16, orders=9, part=9, customer=8 are "wide"

# Queries whose CONTRACT is to return (or scan) full rows of a wide
# table — a full-width ReadSchema is the correct plan, not a miss.
_FULL_WIDTH_OK = {
    "scalar_exprs",        # returns every event column + derived cols
    "clamp_median_fill",   # full-row cleaning pass
    "drop_unparseable",    # full-row cleaning pass
    "dedup_keep_first",    # emits surviving full rows
    "data_profile",        # profiles every column by definition
    "set_ops",             # whole-row set semantics
}


def _file_widths() -> dict[str, int]:
    """table name -> physical column count, from the parquet footers."""
    import pyarrow.parquet as pq

    widths: dict[str, int] = {}
    for f in Path(SF_DIR).glob("*.parquet"):
        widths[f.stem] = len(pq.read_schema(f).names)
    return widths


def _struct_width(read_schema: str) -> int:
    """Top-level field count of a ReadSchema struct<...> string (commas
    inside nested struct/map/array types don't split fields)."""
    inner = read_schema.strip()
    if inner.startswith("struct<") and inner.endswith(">"):
        inner = inner[len("struct<"):-1]
    if not inner:
        return 0
    depth, n = 0, 1
    for ch in inner:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


def _scan_violations(plan: str, widths: dict[str, int]) -> list[str]:
    """Pair each scan's Location table with its ReadSchema and flag
    full-width reads of wide tables."""
    out = []
    # formatted-explain scan blocks list Location before ReadSchema
    blocks = re.findall(
        r"Location:[^\n]*?/(\w+)\.parquet[^\n]*\n(?:.*?\n)*?ReadSchema: (struct<[^\n]*)",
        plan,
    )
    for table, rs in blocks:
        full = widths.get(table)
        if full is None or full < WIDE_THRESHOLD:
            continue
        got = _struct_width(rs)
        if got >= full:
            out.append(f"unpruned scan of {table} ({got}/{full} columns)")
    return out


def main() -> int:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("audit-plans")
    widths = _file_widths()
    qs = registry.queries()
    bad: list[str] = []
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF_DIR)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        errs = []
        if "BatchEvalPython" in plan:
            errs.append("BatchEvalPython (row-at-a-time Python)")
        if name not in _FULL_WIDTH_OK:
            errs.extend(_scan_violations(plan, widths))
        if errs:
            for e in errs:
                bad.append(f"{name}: {e}")
            print(f"VIOLATION {name}: {'; '.join(errs)}", flush=True)
        else:
            print(f"ok {name}", flush=True)
    if bad:
        print("\nVIOLATIONS:")
        for b in bad:
            print(" -", b)
        return 1
    print(
        f"\nAUDIT PASS: {len(qs)} plans, zero BatchEvalPython, "
        "all wide-table scans column-pruned"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
