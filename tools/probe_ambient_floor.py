#!/usr/bin/env python
"""Decompose the ambient per-query floor (VERDICT r15 "Next round"
item 6): 241 of 342 queries run under 2 s at sf0.1 (~238 s of the
fleet total) — where does a sub-2 s query's wall actually go?

Per representative query, in ONE warm session (the bench session
shape), measure:
  - build_sec: the Python query-function call (py4j plan construction
    + analysis chatter, no job);
  - plan_sec: forcing queryExecution().executedPlan() (optimization +
    physical planning, no job);
  - exec_sec: collect() (job scheduling + task run + result fetch);
and repeat the collect a second time (exec2_sec) to split one-off
codegen/JIT from steady-state scheduling cost. Floor reference
probes: spark.range(1).collect() (pure py4j + 1-task job round trip)
and a 32-task no-shuffle job (task-scheduling floor at the session's
default parallelism).

Usage: python tools/probe_ambient_floor.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# spread across families, all <2 s bench rows at sf0.1
QUERIES = [
    "value_quantiles",
    "window_lag_delta",
    "text_normalize",
    "unpivot_daily_metrics",
    "validation_summary",
    "zscore_per_group",
    "sql_lateral_topk_orders",
    "tfidf_top_terms",
    "survival_kaplan_meier",
    "token_counts_bpe",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/probe_ambient_floor_r16.json"
    )
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("probe_ambient_floor")
    registry.prestage(spark, sf_dir)
    qs = registry.queries()
    # warm the session the way bench.py does
    qs["daily_agg"](spark, sf_dir).count()
    qs["monthly_agg"](spark, sf_dir).count()

    floors = {}
    for label, fn in (
        ("range1_collect", lambda: spark.range(1).collect()),
        (
            "task32_noshuffle_collect",
            lambda: spark.range(0, 32, 1, 32).selectExpr("max(id)").collect(),
        ),
        (
            "shuffle32_collect",
            lambda: spark.range(0, 1000, 1, 32)
            .groupBy((spark.range(1).id % 1).alias("k"))
            .count()
            .collect(),
        ),
    ):
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            reps.append(round(time.perf_counter() - t0, 4))
        floors[label] = reps

    rows = {}
    for name in QUERIES:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.collect()
        t3 = time.perf_counter()
        df2 = qs[name](spark, sf_dir)
        t4 = time.perf_counter()
        df2.collect()
        t5 = time.perf_counter()
        rows[name] = {
            "build_sec": round(t1 - t0, 3),
            "plan_sec": round(t2 - t1, 3),
            "exec_sec": round(t3 - t2, 3),
            "rebuild_sec": round(t4 - t3, 3),
            "exec2_sec": round(t5 - t4, 3),
        }
        print(name, rows[name], flush=True)

    tot = {
        k: round(sum(r[k] for r in rows.values()), 2)
        for k in next(iter(rows.values()))
    }
    art = {
        "sf_dir": sf_dir,
        "method": (
            "one warm session (bench shape); build = python fn call, "
            "plan = executedPlan force, exec = collect; second "
            "build+collect splits codegen/JIT one-offs from steady state"
        ),
        "floor_probes_sec": floors,
        "per_query": rows,
        "totals": tot,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out)
    print("totals:", tot)


if __name__ == "__main__":
    main()
