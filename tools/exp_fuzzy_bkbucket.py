#!/usr/bin/env python
"""Measured verdict on a (band, bkey)-bucketed staged band-key table
for fuzzy_pairs_blocked — the fuzzy analog of the jaccard w-bucket
experiment (r14; jaccard's verdict: bucketing pays exactly when the
bucket key matches the heavy join's key).

fuzzy_pairs_blocked's heavy path is: window rank per (band, bkey)
(the _FUZ_BUCKCAP cap) feeding a self-join on (band, bkey). BOTH are
keyed on the bucket candidate key, so a (band, bkey)-bucketed scan
could serve the window AND both join sides shuffle-free; the member
expansion joins stay pfx-keyed either way.

Variant under test: _staged_fuz_keys' frame saved as an external
catalog table bucketed(32) by (band, bkey), sorted by
(band, bkey, doc_id) — the window's exact order — consumed by a copy
of the production query body reading spark.table instead of parquet.

Cold subprocess per measurement, interleaved variants, output
identity via sorted result hash.

Usage: python tools/exp_fuzzy_bkbucket.py [sf_dir] [out_json]
       python tools/exp_fuzzy_bkbucket.py --child {base|bkbucket} SF_DIR

ADOPTED (r14): the verdict was positive (sf0.1 won every interleaved
pair 8.75->3.67 / 5.18->2.95 / 4.98->3.73 s; 100x medians
30.3->24.6 s) and _staged_fuz_keys now produces the bucketed table in
production — so a re-run's "base" measures the ADOPTED plan and the
two variants should now tie. Artifacts from the pre-adoption run:
exp_fuzzy_bkbucket_{sf01,100x}_r14.json.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TBL = "exp_fuz_keys_bkbucket"


def _result_hash(rows) -> str:
    payload = "\n".join(f"{r.id_a}|{r.id_b}|{r.edit_dist}" for r in sorted(rows))
    return hashlib.md5(payload.encode()).hexdigest()


def _variant_bkbucket(spark, sf_dir: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineeringproject_spark.operators.similarity import (
        ensure_min_parallelism,
    )
    from dataengineeringproject_spark.queries.curation import (
        _FUZ_BUCKCAP,
        _LEV_MAX,
        _LEV_PREFIX,
        _docs,
    )

    d = ensure_min_parallelism(_docs(spark, sf_dir), "doc_id")
    pfx = F.substring(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        1,
        _LEV_PREFIX,
    )
    mem = d.select("doc_id", pfx.alias("pfx"))
    k = spark.table(TBL)
    reps = k.filter(F.col("band") == 0).select("pfx", "doc_id")
    wbk = Window.partitionBy("band", "bkey").orderBy(F.asc("doc_id"))
    k = (
        k.withColumn("rn", F.row_number().over(wbk))
        .filter(F.col("rn") <= _FUZ_BUCKCAP)
        .drop("rn")
    )
    a = k.select(
        F.col("doc_id").alias("id_a"), F.col("pfx").alias("pfx_a"), "band", "bkey"
    )
    b = k.select(
        F.col("doc_id").alias("id_b"),
        F.col("pfx").alias("pfx_b"),
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
    )
    dist = F.levenshtein("pfx_a", "pfx_b", _LEV_MAX)
    rp = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("pfx_a", "pfx_b", dist.cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
        .distinct()
    )
    rp_sym = (
        rp.unionAll(
            rp.select(
                F.col("pfx_b").alias("pfx_a"),
                F.col("pfx_a").alias("pfx_b"),
                "edit_dist",
            )
        ).unionAll(
            reps.select(
                F.col("pfx").alias("pfx_a"),
                F.col("pfx").alias("pfx_b"),
                F.lit(0).cast("long").alias("edit_dist"),
            )
        )
    )
    return (
        rp_sym.join(
            mem.select(F.col("pfx").alias("pfx_a"), F.col("doc_id").alias("id_a")),
            "pfx_a",
        )
        .join(
            mem.select(F.col("pfx").alias("pfx_b"), F.col("doc_id").alias("id_b")),
            "pfx_b",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "edit_dist")
    )


def child(variant: str, sf_dir: str) -> None:
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries.curation import _staged_fuz_keys
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("exp_fuzzy_bkbucket")
    keys_path = _staged_fuz_keys(spark, sf_dir)  # untimed in both variants
    if variant == "bkbucket":
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{TBL}", ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {TBL}")
        (
            spark.table(keys_path)  # r14: staged producer returns a table name
            .write.bucketBy(32, "band", "bkey")
            .sortBy("band", "bkey", "doc_id")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(TBL)
        )
        t0 = time.perf_counter()
        rows = _variant_bkbucket(spark, sf_dir).collect()
        sec = time.perf_counter() - t0
    else:
        qfn = registry.queries()["fuzzy_pairs_blocked"]
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
    out = args[1] if len(args) > 1 else "/tmp/exp_fuzzy_bkbucket.json"
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
            print(f"rep{rep} {variant}: {rec['sec']} s hash={rec['hash'][:10]}", flush=True)
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
