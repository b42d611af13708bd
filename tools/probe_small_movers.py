#!/usr/bin/env python
"""Cold re-measure of the four small-query bench movers VERDICT r14
watch item 3 flagged (byte-identical code, 1-4 s absolute moves inside
a warm 342-query session): cdc_latest_state_tombstones,
domain_centroid_topk, profile_table, vocab_coverage_topk.

One FRESH subprocess per (query, rep) — the r3/r14 hypothesis is that
these are warmup-position effects of the long warm bench session, so a
cold measurement next to the same session's drift-control fields either
puts them back inside the ambient band or exposes a real cause.

Usage: python tools/probe_small_movers.py [sf_dir] [out_json]
       python tools/probe_small_movers.py --child QUERY SF_DIR
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MOVERS = [
    "cdc_latest_state_tombstones",
    "domain_centroid_topk",
    "profile_table",
    "vocab_coverage_topk",
]


def child(name: str, sf_dir: str) -> None:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("probe_small_movers")
    registry.prestage(spark, sf_dir)  # untimed, mirrors bench methodology
    qfn = registry.queries()[name]
    t0 = time.perf_counter()
    n = len(qfn(spark, sf_dir).collect())
    sec = time.perf_counter() - t0
    import bench

    drift = bench._drift_control(spark, registry.queries())
    print(
        "RESULT "
        + json.dumps(
            {"query": name, "sec": round(sec, 3), "n_rows": n, "drift": drift}
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], sys.argv[i + 2])
        return
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/probe_small_movers.json"
    runs = []
    for rep in range(2):
        for name in MOVERS:
            proc = subprocess.run(
                [sys.executable, __file__, "--child", name, sf_dir],
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
                print(f"rep{rep} {name}: CHILD FAILED")
                print((proc.stderr or proc.stdout)[-2000:])
                return
            rec = json.loads(line)
            rec["rep"] = rep
            runs.append(rec)
            print(f"rep{rep} {name}: {rec['sec']} s", flush=True)
    art = {
        "method": (
            "one fresh subprocess per (query, rep); prestage untimed; "
            "each child embeds its own drift-control fields"
        ),
        "sf_dir": sf_dir,
        "r14_warm_bench_rows": {
            "cdc_latest_state_tombstones": 1.50,
            "domain_centroid_topk": 2.14,
            "profile_table": 3.68,
            "vocab_coverage_topk": 1.12,
        },
        "r13_warm_bench_rows": {
            "cdc_latest_state_tombstones": 0.75,
            "domain_centroid_topk": 1.27,
            "profile_table": 2.36,
            "vocab_coverage_topk": 0.74,
        },
        "runs": runs,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
