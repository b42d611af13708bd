#!/usr/bin/env python
"""r15 experiment: does moving the EPHEMERAL streaming checkpoint
(offsets/commits WAL + state store files) from disk-backed /tmp to
tmpfs (/dev/shm) measurably cut the streaming family's per-batch
fixed cost — and is the output hash-identical?

Context: every bench streaming query drives an availableNow run into
a MEMORY sink. Without an explicit checkpointLocation Spark creates a
temporary checkpoint under java.io.tmpdir (/tmp — disk-backed here)
and deletes it at stop; its durability buys nothing because the sink
itself dies with the process. The candidate change scopes ONLY this
harness path (run_to_memory): production jobs pass a durable
checkpointLocation and are unaffected.

Method: one COLD subprocess per (variant, query, rep) — fresh JVM,
fresh state dirs; landing-zone staging untimed (prestage before the
timed region, same as bench.py); timed action = full collect() of the
final result (bench methodology); output hash recorded to prove the
variants compute identical results.

Usage: python tools/exp_stream_ckpt.py [sf_dir] [out.json] [reps]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "exp_stream_ckpt_sf01_r15.json"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

QUERIES = [
    "streaming_band_join",
    "streaming_outer_join",
    "streaming_dedup_daily_counts",
    "streaming_cms_heavy_hitters",
    "streaming_daily_means",
]

CHILD = r"""
import hashlib, json, os, sys, time
sys.path.insert(0, {repo!r})
name = {name!r}
sf_dir = {sf_dir!r}
variant = {variant!r}

if variant == "shm":
    os.environ["SPARK_GRAFT_STREAM_CKPT_BASE"] = "/dev/shm"
else:
    os.environ.pop("SPARK_GRAFT_STREAM_CKPT_BASE", None)

from dataengineeringproject_spark import registry
from dataengineeringproject_spark.session import get_spark

spark = get_spark("exp_stream_ckpt")
qs = registry.queries()
registry.prestage(spark, sf_dir)
# untimed warmup of the landing zone staging for this query family
t0 = time.perf_counter()
rows = qs[name](spark, sf_dir).collect()
sec = time.perf_counter() - t0
norm = sorted(
    tuple(
        (None if v is None else round(v, 9) if isinstance(v, float) else str(v))
        for v in r
    )
    for r in rows
)
h = hashlib.md5(repr(norm).encode()).hexdigest()
print(json.dumps({{"sec": round(sec, 2), "n_rows": len(rows), "hash": h}}))
"""


def run_child(name: str, variant: str) -> dict:
    code = CHILD.format(repo=str(REPO), name=name, sf_dir=SF_DIR, variant=variant)
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=900,
    )
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    try:
        return json.loads(line)
    except Exception:
        return {"err": (r.stderr or r.stdout)[-800:]}


def main() -> None:
    runs = []
    for rep in range(REPS):
        for name in QUERIES:
            for variant in ("base", "shm"):
                res = run_child(name, variant)
                res.update({"query": name, "variant": variant, "rep": rep})
                runs.append(res)
                print(json.dumps(res), flush=True)
    (REPO / OUT).write_text(
        json.dumps(
            {
                "method": "cold subprocess per (variant, query, rep); "
                "prestage untimed; timed action = full collect",
                "sf_dir": SF_DIR,
                "runs": runs,
            },
            indent=1,
        )
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
