#!/usr/bin/env python
"""Measured verdict on a `w`-bucketed posting table for
jaccard_prefix_filter_join (VERDICT r13 item 6).

r13 measured the doc_id-bucketed tokset SLOWER (14.7/17.2 s vs 8.9 s
fresh): the fixed 32-bucket scan pins partitioning and defeats AQE
coalescing, and half the consumers need w-keyed shuffles. The
_staged_tokset docstring itself notes a 100 TB deployment would
bucket by `w` FOR the posting join — this experiment prices that
claim on this engine.

Variant under test: the REP-LEVEL posting table (tokset semi-joined
to set-group representatives — the frame every heavy consumer
actually reads) saved as a spark_catalog table bucketed+sorted by
`w`, consumed WITHOUT the localCheckpoint (a checkpoint would erase
the bucketing metadata). w-keyed consumers (document frequency, the
prefix self-join) should then skip their shuffles; doc-keyed
consumers (per-doc size, the rank window, verification) still pay
theirs, now against a pinned 32-partition scan.

Each measurement runs in its own COLD subprocess (the r13/r14
pristine convention). Output identity is asserted via a sorted
result hash compared across variants.

Usage: python tools/exp_jaccard_wbucket.py [sf_dir] [out_json]
       python tools/exp_jaccard_wbucket.py --child {base|wbucket} SF_DIR
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TBL = "exp_tokset_wbucket"


def _result_hash(rows) -> str:
    payload = "\n".join(
        f"{r.id_a}|{r.id_b}|{r.jaccard:.6f}" for r in sorted(rows)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _variant_wbucket(spark, sf_dir: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineeringproject_spark.queries.llm_text import (
        _PPJ_T,
        _staged_docg,
    )

    tokset = spark.table(TBL)  # rep-level, bucketed by w
    docg = spark.read.parquet(_staged_docg(spark, sf_dir))
    reps = docg.groupBy("gh").agg(F.min("doc_id").alias("doc_id"))
    n = tokset.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = tokset.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy("df", "w")
    r = (
        tokset.join(dfreq.hint("merge"), "w")
        .join(n.hint("merge"), "doc_id")
        .withColumn("rnk", F.row_number().over(wdoc))
    )
    pref = r.filter(
        F.col("rnk")
        <= F.col("n") - F.ceil(F.lit(_PPJ_T) * F.col("n")).cast("long") + 1
    ).select("doc_id", "w")
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ta = tokset.select(F.col("doc_id").alias("id_a"), "w")
    tb = tokset.select(F.col("doc_id").alias("id_b"), "w")
    inter = (
        cand.join(ta.hint("merge"), "id_a")
        .join(tb.hint("merge"), ["id_b", "w"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = n.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = n.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("i") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("i"))
    rg = reps.select(F.col("doc_id").alias("rid"), "gh")
    rp = (
        inter.join(na.hint("merge"), "id_a")
        .join(nb.hint("merge"), "id_b")
        .filter(jac >= _PPJ_T)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .join(rg.select(F.col("rid").alias("id_a"), F.col("gh").alias("gh_a")).hint("merge"), "id_a")
        .join(rg.select(F.col("rid").alias("id_b"), F.col("gh").alias("gh_b")).hint("merge"), "id_b")
        .select("gh_a", "gh_b", "jaccard")
    )
    rp_sym = (
        rp.unionAll(
            rp.select(
                F.col("gh_b").alias("gh_a"), F.col("gh_a").alias("gh_b"), "jaccard"
            )
        ).unionAll(
            reps.select(
                F.col("gh").alias("gh_a"),
                F.col("gh").alias("gh_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
    )
    return (
        rp_sym.join(
            docg.select(F.col("gh").alias("gh_a"), F.col("doc_id").alias("id_a")).hint("merge"),
            "gh_a",
        )
        .join(
            docg.select(F.col("gh").alias("gh_b"), F.col("doc_id").alias("id_b")).hint("merge"),
            "gh_b",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "jaccard")
    )


def child(variant: str, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries.llm_text import (
        _staged_docg,
        _staged_tokset,
    )
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("exp_jaccard_wbucket")
    # staging is untimed in BOTH variants (the bench convention)
    tok_path = _staged_tokset(spark, sf_dir)
    _staged_docg(spark, sf_dir)
    if variant == "wbucket":
        # each child gets a fresh derby metastore but the managed-table
        # LOCATION persists in the warehouse dir across processes —
        # clear it or saveAsTable fails with LOCATION_ALREADY_EXISTS
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{TBL}", ignore_errors=True)
        tokset_all = spark.read.parquet(tok_path)
        docg = spark.read.parquet(_staged_docg(spark, sf_dir))
        reps = docg.groupBy("gh").agg(F.min("doc_id").alias("doc_id"))
        (
            tokset_all.join(reps.select("doc_id"), "doc_id", "left_semi")
            .write.bucketBy(32, "w")
            .sortBy("w")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(TBL)
        )
        t0 = time.perf_counter()
        rows = _variant_wbucket(spark, sf_dir).collect()
        sec = time.perf_counter() - t0
    else:
        qfn = registry.queries()["jaccard_prefix_filter_join"]
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
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/exp_jaccard_wbucket.json"
    runs = []
    for rep in range(3):
        for variant in ("base", "wbucket"):
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
