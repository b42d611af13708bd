#!/usr/bin/env python
"""r13 (VERDICT r12 item 3): separate single-JVM heap churn from plan
cost in `knn_classifier_eval_lsh`'s warm-vs-fresh ~4x gap.

Background: at the 100x fixture the query measures 46-66 s in a fresh
local[32] session but ~180-190 s inside the r12 battery's WARM session
(after other heavy queries ran), and neither per-query cache isolation
nor removing the probe's split override closed the gap. Hypothesis
(SURVEY §8.15 item a): local[32] runs driver + all executor threads in
ONE JVM, so allocation churn from earlier queries (old-gen pressure,
code-cache and JIT state) taxes later ones — a pure test-harness
artifact that cannot exist on a real cluster where executors are
separate JVMs.

Design: run the same fresh -> churn -> warm sequence in TWO masters,
one subprocess each (fully cold JVMs):
  - local[32]            — the single-JVM shape every probe uses;
  - local-cluster[4,8,4096] — 4 SEPARATE executor JVMs x 8 cores,
    4 GB each: same 32 cores, but churn lands in executor heaps that
    the timed query's executors share ONLY via the cluster's normal
    shuffle/broadcast paths (and the driver JVM does plans only).
Sequence inside each subprocess (timing action toPandas):
  1. time knn PRISTINE — first action in the cold JVM, before
     prestage (valid: knn consumes no staged artifact; this is the
     r12 "fresh-session single-query" condition);
  2. clearCache + prestage, time knn (POST-PRESTAGE — the r13 first
     run showed the prestage pass alone already moves knn to ~180 s);
  3. churn: ann_ivfpq_topk + dedup_semantic (the two heavy queries the
     r12 battery ran before knn), clearCache + re-prestage;
  4. time knn again (WARM).
Verdict rule: if warm/pristine >> 1 under local[32] but ~1 under
local-cluster, the gap is single-JVM heap churn — record the
pristine-session number as the local contract and move on; if the gap
survives separate executor JVMs, it is executor-side accumulated
state (GC/JIT/allocator growth) that a real long-lived cluster would
also see — a different, more interesting conclusion.

Usage: python tools/probe_knn_split.py [out_json] [fixture_dir]
Defaults: probe_knn_split_r13.json /tmp/deps_scale100.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
master, d = sys.argv[1], sys.argv[2]
from pyspark.sql import SparkSession

# mirror session.get_spark's pinned configs, master overridden (the
# factory hardcodes local[$CPUS]; this probe is the one consumer that
# must vary the master, and duplicating the conf block keeps the
# production factory free of probe-only knobs)
spark = (
    SparkSession.builder.master(master)
    .appName("probe_knn_split")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.executor.memory", "4g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")
from dataengineeringproject_spark import registry

qs = registry.queries()

def timed(name, stage=True):
    if stage:
        spark.catalog.clearCache()
        registry.prestage(spark, d)
    t0 = time.perf_counter()
    n = len(qs[name](spark, d).toPandas())
    return round(time.perf_counter() - t0, 2), n

# knn consumes no staged artifact (it computes buckets from the raw
# embeddings table), so a PRISTINE timing — first action in the cold
# JVM, before prestage runs anything heavy — is valid and is the r12
# "fresh-session single-query" condition. The r13 first run showed the
# prestage pass ALONE (sig index + codebooks + posting tables) already
# moves the subsequent knn to ~180 s, i.e. "warm" starts at prestage.
pristine_sec, pristine_rows = timed("knn_classifier_eval_lsh", stage=False)
post_stage_sec, _ = timed("knn_classifier_eval_lsh")
churn = {}
for cq in ("ann_ivfpq_topk", "dedup_semantic"):
    churn[cq], _ = timed(cq)
warm_sec, warm_rows = timed("knn_classifier_eval_lsh")
print("CHILD_RESULT " + json.dumps({
    "master": master, "pristine_sec": pristine_sec,
    "post_prestage_sec": post_stage_sec, "warm_sec": warm_sec,
    "warm_over_pristine": round(warm_sec / max(pristine_sec, 1e-9), 2),
    "churn_sec": churn, "rows": pristine_rows,
    "rows_stable": pristine_rows == warm_rows,
}))
spark.stop()
"""


def run_master(master: str, fixture: str) -> dict:
    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, master, fixture],
        capture_output=True, text=True, env=env, cwd="/tmp",
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("CHILD_RESULT "):
            return json.loads(ln[len("CHILD_RESULT "):])
    raise RuntimeError(
        f"{master}: no result\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "probe_knn_split_r13.json"
    fixture = sys.argv[2] if len(sys.argv) > 2 else "/tmp/deps_scale100"
    result = {
        "fixture": fixture,
        "method": "fresh -> churn(ann_ivfpq_topk, dedup_semantic) -> warm;"
                  " clearCache + re-prestage before every timed run;"
                  " one cold subprocess per master",
        "runs": [],
    }
    for master in ("local[32]", "local-cluster[4,8,4096]"):
        print("running", master, flush=True)
        r = run_master(master, fixture)
        print(" ", r, flush=True)
        result["runs"].append(r)
    g_local = result["runs"][0]["warm_over_pristine"]
    g_split = result["runs"][1]["warm_over_pristine"]
    result["verdict"] = (
        "single-JVM heap churn (gap vanishes with separate executor JVMs)"
        if g_local >= 1.5 and g_split < 1.3
        else "gap persists under split executors — executor-side"
        " accumulated state, not driver/executor co-residency"
        if g_local >= 1.5 and g_split >= 1.5
        else "gap only under split executors"
        if g_split >= 1.5
        else "no warm-session gap reproduced this run"
    )
    Path(out).write_text(json.dumps(result, indent=2) + "\n")
    print("wrote", out, "verdict:", result["verdict"])


if __name__ == "__main__":
    main()
