#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with a count()-style action
(foreach-noop would skip result materialization; we use a collect of
the already-small results — every headline query returns grouped/top-k
output, never raw rows at scale).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    # reference-derived pipeline ops
    "daily_agg",
    "monthly_agg",
    "dedup_keep_first",
    "wind_buckets",
    "pipeline_daily_weather_analog",
    # relational breadth
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q8_market_share",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "topk_per_group",
    "window_running_sum",
    "sessionization",
    "salted_skew_agg",
    # LLM-data operators
    "text_stats",
    "dedup_minhash_lsh",
    "cosine_topk",
    "ann_lsh_topk",
    "quality_filter_funnel",
    "contamination_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("bench")
    qs = registry.queries()

    # warm the JVM/session on the smallest SF so first-query JIT/session
    # startup doesn't pollute the per-query numbers.
    qs["daily_agg"](spark, "/root/testdata/sf0.001").count()

    names = [n for n in HEADLINE if n in qs]
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
