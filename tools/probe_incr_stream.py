#!/usr/bin/env python
"""Per-batch breakdown for streaming_dedup_incremental_minhash
(VERDICT r15 "Next round" item 7: it is the one streaming row well
above the family's fixed-cost floor — decompose before attacking).

Attaches a StreamingQueryListener (no engine code touched) and runs
the query cold; every micro-batch's durationMs split (addBatch /
getBatch / latestOffset / queryPlanning / walCommit / commitOffsets /
triggerExecution) lands in the artifact, next to the end-to-end wall
the bench sees. The query runs {slices} foreachBatch triggers, each
one incr_dedup_accept step (signatures -> band join vs corpus index +
accepted appends -> exact-Jaccard verify -> two parquet appends).

Usage: python tools/probe_incr_stream.py [sf_dir] [out_json] [reps]

One cold subprocess per rep (fresh JVM + fresh tmp state dirs).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def child(sf_dir: str) -> None:
    from pyspark.sql.streaming import StreamingQueryListener

    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    progress: list[dict] = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            progress.append(
                {
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark = get_spark("probe_incr_stream")
    spark.streams.addListener(L())
    registry.prestage(spark, sf_dir)
    qs = registry.queries()
    t0 = time.perf_counter()
    rows = qs["streaming_dedup_incremental_minhash"](spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    time.sleep(1.0)  # let the listener bus drain
    print(
        "RESULT "
        + json.dumps(
            {
                "wall_sec": round(wall, 2),
                "n_rows": len(rows),
                "batches": progress,
            }
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/root/repo/probe_incr_stream_r16.json"
    reps = int(args[2]) if len(args) > 2 else 2
    runs = []
    for rep in range(reps):
        proc = subprocess.run(
            [sys.executable, __file__, "--child", sf_dir],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        line = next(
            (
                ln[len("RESULT "):]
                for ln in proc.stdout.splitlines()
                if ln.startswith("RESULT ")
            ),
            None,
        )
        if proc.returncode != 0 or line is None:
            print(f"rep{rep}: CHILD FAILED")
            print((proc.stderr or proc.stdout)[-3000:])
            return
        rec = json.loads(line)
        rec["rep"] = rep
        runs.append(rec)
        print(f"rep{rep}: wall {rec['wall_sec']} s, "
              f"{len(rec['batches'])} batches", flush=True)
    art = {
        "method": "cold subprocess per rep; StreamingQueryListener durationMs",
        "sf_dir": sf_dir,
        "runs": runs,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
