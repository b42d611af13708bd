#!/usr/bin/env python
"""Single-node throughput: reference-shaped pandas vs this engine.

The reference (degsryjxyjr/DataEngineeringProject) publishes no
numbers (BASELINE.md), so this harness measures a faithful pandas
re-implementation of its signature computation — the v1-intent daily
aggregate: per-day mean of the measure plus deterministic mode of the
categorical, built the way the reference builds it
(`groupby(k)[v].transform(agg)` broadcast + projection +
`drop_duplicates()`, per SURVEY.md §2.4; mode via `.mode()[0]`,
first-on-tie) — NOT a line-by-line copy — and the engine's `daily_agg`
on the same data (testdata `events` standing in for hourly weather, as
everywhere in the harness).

Run: python bench_reference_analog.py [sf_dir ...]
Prints one JSON line per dataset:
  {"rows": N, "pandas_sec": ..., "spark_sec": ..., "dataset": ...}

Expected shape of the result (recorded in BASELINE.md): pandas wins at
the reference's own ~100k-row scale (no JVM/scheduling overhead),
the engine pulls even around 1M rows and wins beyond — while the
pandas curve is linear-with-memory-cliff and the engine's is flat
until the cluster is actually needed.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))


def pandas_daily_agg(events: pd.DataFrame) -> pd.DataFrame:
    """The reference's transform-broadcast + dedup idiom
    (group_project_dag.py:135-172 shape), applied to events."""
    df = events.copy()
    df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
    df["avg_value"] = df.groupby("day")["value"].transform("mean")
    df["mode_event_type"] = df.groupby("day")["event_type"].transform(
        lambda x: x.mode()[0] if not x.mode().empty else np.nan
    )
    out = df[["day", "avg_value", "mode_event_type"]].drop_duplicates()
    return out.sort_values("day").reset_index(drop=True)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]

    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("bench-reference-analog")
    qs = registry.queries()
    qs["daily_agg"](spark, "/root/testdata/sf0.001").count()  # warm JVM

    for d in dirs:
        events_pd = pd.read_parquet(f"{d}/events.parquet")
        if events_pd["ts"].dtype == "object" or str(events_pd["ts"].dtype).startswith(
            "int"
        ):
            events_pd["ts"] = pd.to_datetime(events_pd["ts"])

        t0 = time.perf_counter()
        ref_out = pandas_daily_agg(events_pd)
        pandas_sec = round(time.perf_counter() - t0, 4)

        t0 = time.perf_counter()
        n = qs["daily_agg"](spark, d).count()
        spark_sec = round(time.perf_counter() - t0, 4)

        assert n == len(ref_out), f"row mismatch: spark={n} pandas={len(ref_out)}"
        print(
            json.dumps(
                {
                    "dataset": d,
                    "rows": int(len(events_pd)),
                    "pandas_sec": pandas_sec,
                    "spark_sec": spark_sec,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
