#!/usr/bin/env python
"""r15 streaming-overhead probe: WHERE does a micro-batch's wall time
go for the bench's heaviest streaming queries?

Monkeypatches streaming.daily.run_to_memory (and the streaming_q
import of it) to keep the StreamingQuery handle and capture
recentProgress after termination, then runs each target query
end-to-end exactly as bench.py does (full collect) and records the
per-batch durationMs breakdown (addBatch, getBatch, latestOffset,
queryPlanning, walCommit, commitOffsets, triggerExecution) plus state
operator commit times.

The question this answers (guide §1 measure-first): is the streaming
family's ~136 s bench block dominated by (a) state-store commit I/O,
(b) per-batch planning, (c) offset/commit WAL writes, or (d) task
scheduling in addBatch — each of which has a different (or no)
legitimate lever. Run in ONE process; each query gets a fresh memory
sink; landing-zone staging is untimed (same as bench prestage).

Usage: python tools/probe_stream_overhead.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "probe_stream_overhead_r15.json"

TARGETS = [
    "streaming_band_join",
    "streaming_outer_join",
    "streaming_corpus_release_gate",
    "streaming_dedup_daily_counts",
    "streaming_bloom_dedup",
    "streaming_cms_heavy_hitters",
    "streaming_daily_means",
]

_DUR_KEYS = (
    "addBatch",
    "getBatch",
    "latestOffset",
    "queryPlanning",
    "walCommit",
    "commitOffsets",
    "triggerExecution",
)


def main() -> None:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark
    import dataengineeringproject_spark.streaming.daily as SD

    captured: list = []

    def patched(stream, query_name, output_mode="update"):
        q = (
            stream.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        captured.append(q.recentProgress)

    SD.run_to_memory = patched
    # streaming_q imported the symbol by name at module load
    import dataengineeringproject_spark.queries.streaming_q as SQ

    if hasattr(SQ, "run_to_memory"):
        SQ.run_to_memory = patched
    # llm_text's streaming twins may import it too
    import dataengineeringproject_spark.queries.llm_text as LT

    if hasattr(LT, "run_to_memory"):
        LT.run_to_memory = patched

    spark = get_spark("probe_stream_overhead")
    qs = registry.queries()
    registry.prestage(spark, SF_DIR)

    results = {}
    for name in TARGETS:
        if name not in qs:
            continue
        captured.clear()
        t0 = time.perf_counter()
        n = len(qs[name](spark, SF_DIR).collect())
        wall = time.perf_counter() - t0
        batches = []
        for prog_list in captured:
            for p in prog_list:
                d = json.loads(p.json) if hasattr(p, "json") else p
                dur = d.get("durationMs", {})
                row = {
                    "batchId": d.get("batchId"),
                    "numInputRows": d.get("numInputRows"),
                }
                for k in _DUR_KEYS:
                    if k in dur:
                        row[k] = dur[k]
                sops = []
                for so in d.get("stateOperators", []):
                    sops.append(
                        {
                            "op": so.get("operatorName"),
                            "commitTimeMs": so.get("commitTimeMs"),
                            "numRowsTotal": so.get("numRowsTotal"),
                            "numShufflePartitions": so.get(
                                "numShufflePartitions"
                            ),
                        }
                    )
                if sops:
                    row["stateOps"] = sops
                batches.append(row)
        results[name] = {
            "wall_sec": round(wall, 2),
            "n_rows": n,
            "n_streams": len(captured),
            "batches": batches,
        }
        print(
            f"{name}: wall {wall:.2f}s rows {n} "
            f"batches {sum(1 for _ in batches)}",
            flush=True,
        )

    Path(OUT).write_text(json.dumps(
        {
            "method": "one warm process; run_to_memory patched to capture "
            "recentProgress; query timed end-to-end as bench.py does",
            "sf_dir": SF_DIR,
            "results": results,
        },
        indent=1,
    ))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
