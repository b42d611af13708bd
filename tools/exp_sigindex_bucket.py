#!/usr/bin/env python
"""Measured verdict on a (band_id, band_key)-bucketed persisted
signature index for dedup_incremental_minhash (VERDICT r14 item 2 /
builder candidate (a)).

Hypothesis under test: `_staged_sig_index`'s r14 docstring CLAIMED the
index "is bucketed BY band_key" but the implementation writes plain
parquet.  The fleet's bucketing rule (jaccard w-bucket, fuzzy
bk-bucket) says bucketing pays exactly when the bucket key matches the
heavy join's shuffle key — here the candidate join keys on
(band_id, band_key).

Prior plan evidence (read before building this harness): at sf0.1 the
candidate join is a BroadcastHashJoin that BUILDS THE BATCH BANDS and
streams the corpus-index FileScan with ZERO exchange on the index
side — there is no index-side shuffle for bucketing to delete.  The
bucketed variant can therefore only tie (or lose by pinning
partitioning and defeating AQE coalescing, the r13 doc_id-tokset
failure mode).  This harness exists to turn that reading into a
measured, artifact-backed verdict at 1x/10x/100x rather than an
assumption — and to catch the regime change if the batch side ever
outgrows broadcast.

Variant under test: the staged index frame saved as an external
catalog table bucketed(32) by (band_id, band_key), sorted by
(band_id, band_key, doc_id), consumed by the production accept step
(`incr_dedup_accept`) reading spark.table instead of parquet.

Cold subprocess per measurement, interleaved variants, output
identity via sorted result hash.

Usage: python tools/exp_sigindex_bucket.py [sf_dir] [out_json]
       python tools/exp_sigindex_bucket.py --child {base|bkbucket} SF_DIR

VERDICT (r15, measured): NEGATIVE — keep plain parquet. The base
plan won every interleaved cold pair at BOTH scales (sf0.1: 6.99/9.01,
7.99/15.73, 19.94/15.3 with the last pair ambient-inflated; 100x:
19.66/27.58, 19.87/22.03, 23.96/34.89 — base sweeps), output
hash-identical throughout (exp_sigindex_bucket_{sf01,100x}_r15.json).
Exactly the prior plan reading: the candidate join broadcasts the
batch bands, so there is no index-side exchange for bucketing to
delete, and the bucketed scan only adds pinned-partitioning overhead
(the r13 doc_id-tokset failure mode). Re-test only if a daily batch
ever outgrows the broadcast threshold.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TBL = "exp_sig_index_bkbucket"


def _result_hash(rows) -> str:
    payload = "\n".join(
        f"{r.id_a}|{r.id_b}|{r.jaccard}|{r.pair_type}" for r in sorted(rows)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _variant_bkbucket(spark, sf_dir: str):
    """Production accept step, corpus index read from the bucketed
    catalog table instead of the plain-parquet staged path."""
    from dataengineeringproject_spark.queries.llm_text import (
        _INCR_EXISTING_PCT,
        _docs,
        _incr_bucket,
        incr_dedup_accept,
    )

    d = _docs(spark, sf_dir)
    batch = d.filter(_incr_bucket("doc_id") >= _INCR_EXISTING_PCT)
    cbands = spark.table(TBL)
    pairs, _bands = incr_dedup_accept(cbands, batch, d)
    return pairs


def child(variant: str, sf_dir: str) -> None:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries.llm_text import _staged_sig_index
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("exp_sigindex_bucket")
    idx_path = _staged_sig_index(spark, sf_dir)  # untimed in both variants
    if variant == "bkbucket":
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{TBL}", ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {TBL}")
        (
            spark.read.parquet(idx_path)
            .write.bucketBy(32, "band_id", "band_key")
            .sortBy("band_id", "band_key", "doc_id")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(TBL)
        )
        t0 = time.perf_counter()
        rows = _variant_bkbucket(spark, sf_dir).collect()
        sec = time.perf_counter() - t0
    else:
        qfn = registry.queries()["dedup_incremental_minhash"]
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
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/exp_sigindex_bucket.json"
    runs = []
    for rep in range(3):
        for variant in ("base", "bkbucket"):
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
            print(
                f"rep{rep} {variant}: {rec['sec']} s hash={rec['hash'][:10]}",
                flush=True,
            )
    hashes = {r["hash"] for r in runs}
    art = {
        "method": "cold subprocess per measurement; staging+bucketed-table build untimed",
        "sf_dir": sf_dir,
        "output_identical": len(hashes) == 1,
        "runs": runs,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out, "output_identical:", len(hashes) == 1)


if __name__ == "__main__":
    main()
