#!/usr/bin/env python
"""Explain-or-clear probe for streaming_dedup_daily_counts (VERDICT
r13 item 1/2): its BENCH_r13 row moved 7.08 -> 28.49 s (4.0x) on
byte-identical code while the round's ambient drift band was
1.2-1.36x — the worst same-code regression in the 342-query diff.

Hypotheses from the verdict:
  (a) drift multiplies micro-batch count nonlinearly (pacing on a
      slower box) -> batch counts would differ from the control run;
  (b) dropDuplicatesWithinWatermark state-store churn is real and
      grew -> stateOperators metrics would show it;
  (c) pure ambient/warm-session noise -> a fresh isolated session
      lands back inside the band and the control moves identically.

Method (the probe_knn_split.py pattern): each measurement runs in its
own COLD subprocess (fresh JVM, fresh state-store dirs). The child
monkeypatches the memory-sink runner to capture every
StreamingQueryProgress (batch count, per-batch durationMs,
stateOperators rows/memory) and times the registered query end-to-end
exactly as bench.py does (full collect). A control streaming query
(streaming_daily_means — same staged landing zone, same window
aggregate, NO dedup operator) runs under identical conditions so a
box-speed move is separable from a dedup-specific one.

Usage:
  python tools/probe_streaming_dedup.py            # parent: 2 repeats each
  python tools/probe_streaming_dedup.py --child Q  # one cold measurement

Artifact: tools/probe_streaming_dedup_r14.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["streaming_dedup_daily_counts", "streaming_daily_means"]


def child(name: str) -> None:
    import time

    from pyspark.sql import DataFrame

    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries import streaming_q as SQ
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("probe_streaming_dedup")

    progress: list[dict] = []

    def run_capturing(stream: DataFrame, query_name: str, output_mode: str = "update") -> None:
        q = (
            stream.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress.extend(json.loads(p.json) for p in q.recentProgress)

    SQ.run_to_memory = run_capturing

    # same untimed staging bench.py does (landing-zone write is not the
    # per-query cost under test)
    SQ._staged_events(spark, SF_DIR)
    SQ._staged_events(spark, SF_DIR, dups=True)

    t0 = time.perf_counter()
    n = len(registry.queries()[name](spark, SF_DIR).collect())
    wall = time.perf_counter() - t0

    batches = [p for p in progress if p.get("numInputRows", 0) >= 0]
    state = [
        {
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "triggerMs": p.get("durationMs", {}).get("triggerExecution"),
            "stateOps": [
                {
                    k: so.get(k)
                    for k in (
                        "operatorName",
                        "numRowsTotal",
                        "numRowsUpdated",
                        "memoryUsedBytes",
                        "commitTimeMs",
                    )
                }
                for so in p.get("stateOperators", [])
            ],
        }
        for p in batches
    ]
    print(
        json.dumps(
            {
                "query": name,
                "wall_sec": round(wall, 2),
                "n_rows": n,
                "n_batches": len(batches),
                "batches": state,
            }
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return
    runs = []
    for rep in range(2):
        for name in QUERIES:
            out = subprocess.run(
                [sys.executable, __file__, "--child", name],
                capture_output=True,
                text=True,
                check=True,
                cwd=str(Path(__file__).resolve().parent.parent),
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            rec["rep"] = rep
            runs.append(rec)
            print(
                f"rep{rep} {name}: {rec['wall_sec']} s, "
                f"{rec['n_batches']} batches",
                flush=True,
            )
    art = {
        "method": (
            "one cold subprocess per measurement (fresh JVM + state dirs); "
            "query timed end-to-end as bench.py does (full collect) after "
            "untimed landing-zone staging; progress captured from "
            "recentProgress"
        ),
        "sf_dir": SF_DIR,
        "bench_r12_sec": {"streaming_dedup_daily_counts": 7.08},
        "bench_r13_sec": {"streaming_dedup_daily_counts": 28.49},
        "runs": runs,
    }
    out_path = Path(__file__).parent.parent / "probe_streaming_dedup_r14.json"
    out_path.write_text(json.dumps(art, indent=1) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
