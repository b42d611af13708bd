#!/usr/bin/env python
"""Measured verdict on the gram-hash shuffle key for
dedup_substring_exact (r14): the query's own docstring names the
100 TB plan — ship xxhash64(gram) (8 bytes) through the gram-grain
shuffles instead of the 40-char window text (~48 bytes + comparison
cost). The oracle stays text-based (DuckDB has no xxhash64), so the
swap is engine-internal and output-identical up to 64-bit collisions
(~n²/2^65; ~1e-9 at 1e13 windows — the risk the docstring already
prices).

Variant under test: identical pipeline with
  gh = xxhash64(gram)  computed in the explode projection,
  (doc_id, gh) pre-aggregation, gh-keyed document-count aggregate,
  gh-keyed merge join — no text gram ever shuffles.

Cold subprocess per measurement, interleaved variants; output
identity asserted via a sorted hash of the per-doc rows.

Usage: python tools/exp_substr_hashkey.py [sf_dir] [out_json]
       python tools/exp_substr_hashkey.py --child {base|hashkey} SF_DIR
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _result_hash(rows) -> str:
    payload = "\n".join(
        f"{r.doc_id}|{r.total_pos}|{r.dup_pos}|{r.dup_ratio:.6f}"
        for r in sorted(rows)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _variant_hashkey(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from dataengineeringproject_spark.operators import similarity as SIM
    from dataengineeringproject_spark.queries.llm_text import _SSTR_L, _docs

    d = SIM.ensure_min_parallelism(
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .filter(F.length("text") >= _SSTR_L),
        "doc_id",
    )
    g = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - _SSTR_L + 1)
        ).alias("i"),
        "text",
    ).select(
        "doc_id",
        F.xxhash64(F.expr(f"substring(text, i, {_SSTR_L})")).alias("gh"),
    )
    dg = g.groupBy("doc_id", "gh").agg(F.count(F.lit(1)).alias("c"))
    gc = dg.groupBy("gh").agg(F.count(F.lit(1)).alias("nd"))
    dup_c = F.sum(F.when(F.col("nd") >= 2, F.col("c")))
    return (
        dg.join(gc.hint("merge"), "gh")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("total_pos"),
            F.coalesce(dup_c, F.lit(0)).cast("long").alias("dup_pos"),
            F.round(
                F.coalesce(dup_c, F.lit(0)) * F.lit(1.0) / F.sum("c"), 6
            ).alias("dup_ratio"),
        )
    )


def child(variant: str, sf_dir: str) -> None:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("exp_substr_hashkey")
    if variant == "hashkey":
        fn = _variant_hashkey
    else:
        q = registry.queries()["dedup_substring_exact"]
        fn = lambda s, sf: q(s, sf)  # noqa: E731
    t0 = time.perf_counter()
    rows = fn(spark, sf_dir).collect()
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
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/exp_substr_hashkey.json"
    runs = []
    for rep in range(2):
        for variant in ("base", "hashkey"):
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
                print(f"rep{rep} {variant}: CHILD FAILED")
                print((proc.stderr or proc.stdout)[-3000:])
                return
            rec = json.loads(line)
            rec["rep"] = rep
            runs.append(rec)
            print(f"rep{rep} {variant}: {rec['sec']} s hash={rec['hash'][:10]}", flush=True)
    hashes = {r["hash"] for r in runs}
    art = {
        "method": "cold subprocess per measurement, interleaved variants",
        "sf_dir": sf_dir,
        "output_identical": len(hashes) == 1,
        "runs": runs,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out, "output_identical:", len(hashes) == 1)


if __name__ == "__main__":
    main()
