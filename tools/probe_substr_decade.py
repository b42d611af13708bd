#!/usr/bin/env python
"""Price dedup_substring_exact's superlinear third decade (VERDICT r14
item 3 / watch item 2): 10x->100x wall time was 18.4x for 10x data
(probe_scale100_dedup_r14.json) even though output rows grow exactly
10x per decade.

Two questions, answered by measurement rather than a cap-first reflex:

1. Is any INTERMEDIATE frame superlinear?  The plan is explode ->
   (doc,gram) partial-combine -> gram-grain count -> merge join back.
   Every frame should be linear in corpus characters regardless of
   duplicated mass (each dg row joins exactly one gc row).  The
   `--census` child counts windows / dg / gc / join-output rows per
   scale; if those grow ~10x per decade the growth is NOT candidate-
   multiplicity and a gram-frequency cap would trade recall for a
   problem the query does not have.

2. If the frames are linear, the superlinearity is an EXECUTION-regime
   artifact: 1.3e8-row gram-grain sorts across the session's 32
   shuffle partitions (~4M rows each) spill where the 10x sorts fit.
   The `parts` variant re-runs the identical plan under a pinned
   higher shuffle-partition count (the knob a 100 TB job sets per-job;
   AQE coalesces it back down when small) — if that flattens the
   decade, the fix is partition sizing, not an approximation cap.

Cold subprocess per measurement, interleaved variants, output
identity via sorted result hash.

Usage: python tools/probe_substr_decade.py [out_json]
       python tools/probe_substr_decade.py --child VARIANT SF_DIR
       python tools/probe_substr_decade.py --census SF_DIR
VARIANT = base | parts256
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALES = {
    "1x": "/root/testdata/sf0.1",
    "10x": "/tmp/deps_scale10",
    "100x": "/tmp/deps_scale100",
}


def _result_hash(rows) -> str:
    payload = "\n".join(
        f"{r.doc_id}|{r.total_pos}|{r.dup_pos}|{r.dup_ratio}"
        for r in sorted(rows)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def census(sf_dir: str) -> None:
    """Row counts of every intermediate frame — the linearity check."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.operators import similarity as SIM
    from dataengineeringproject_spark.queries.llm_text import _SSTR_L, _docs
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("probe_substr_census")
    d = SIM.ensure_min_parallelism(
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .filter(F.length("text") >= _SSTR_L),
        "doc_id",
    )
    g = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text") - _SSTR_L + 1)).alias(
            "i"
        ),
        "text",
    ).select(
        "doc_id",
        F.xxhash64(F.expr(f"substring(text, i, {_SSTR_L})")).alias("gram"),
    )
    dg = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    gc = dg.groupBy("gram").agg(F.count(F.lit(1)).alias("nd"))
    n_docs = d.count()
    n_windows = g.count()
    n_dg = dg.count()
    row = gc.agg(
        F.count(F.lit(1)).alias("n_gc"),
        F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup_grams"),
        F.max("nd").alias("max_nd"),
    ).collect()[0]
    print(
        "CENSUS "
        + json.dumps(
            {
                "n_docs": n_docs,
                "n_windows": n_windows,
                "n_dg": n_dg,
                "n_gc": row.n_gc,
                "n_dup_grams": row.n_dup_grams,
                "max_nd": row.max_nd,
                "n_join_out": n_dg,  # dg JOIN gc on gram is 1:1 per dg row
            }
        )
    )


def child(variant: str, sf_dir: str) -> None:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries.streaming_q import (
        _pinned_shuffle_partitions,
    )
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("probe_substr_decade")
    qfn = registry.queries()["dedup_substring_exact"]
    if variant == "parts256":
        with _pinned_shuffle_partitions(spark, 256):
            t0 = time.perf_counter()
            rows = qfn(spark, sf_dir).collect()
            sec = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        rows = qfn(spark, sf_dir).collect()
        sec = time.perf_counter() - t0
    print(
        "RESULT "
        + json.dumps(
            {
                "variant": variant,
                "sec": round(sec, 2),
                "n_rows": len(rows),
                "hash": _result_hash(rows),
            }
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], sys.argv[i + 2])
        return
    if "--census" in sys.argv:
        census(sys.argv[sys.argv.index("--census") + 1])
        return
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_substr_decade.json"
    art: dict = {"census": {}, "runs": {}}
    for scale, sf_dir in SCALES.items():
        proc = subprocess.run(
            [sys.executable, __file__, "--census", sf_dir],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        line = next(
            (
                ln[len("CENSUS "):]
                for ln in proc.stdout.splitlines()
                if ln.startswith("CENSUS ")
            ),
            None,
        )
        if line is None:
            print(f"census {scale}: FAILED"); print((proc.stderr or "")[-2000:])
            return
        art["census"][scale] = json.loads(line)
        print(f"census {scale}: {line}", flush=True)
    for scale in ("10x", "100x"):
        sf_dir, runs = SCALES[scale], []
        for rep in range(2):
            for variant in ("base", "parts256"):
                proc = subprocess.run(
                    [sys.executable, __file__, "--child", variant, sf_dir],
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
                    print(f"{scale} rep{rep} {variant}: CHILD FAILED")
                    print((proc.stderr or proc.stdout)[-3000:])
                    return
                rec = json.loads(line)
                rec["rep"] = rep
                runs.append(rec)
                print(
                    f"{scale} rep{rep} {variant}: {rec['sec']} s "
                    f"hash={rec['hash'][:10]}",
                    flush=True,
                )
        art["runs"][scale] = runs
    for scale in art["runs"]:
        hashes = {r["hash"] for r in art["runs"][scale]}
        art["runs"][scale + "_output_identical"] = len(hashes) == 1
    art["method"] = (
        "cold subprocess per measurement, interleaved variants; census "
        "children count intermediate frames to test linearity per decade"
    )
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
