#!/usr/bin/env python
"""Measured verdict on a DUAL-layout rep-level posting table for
jaccard_prefix_filter_join (r14, SURVEY round-15 candidate (c)):
after the w-bucket adoption the 100x residue (~57 s) is dominated by
the doc/gh-keyed verification joins. The production pattern at
100 TB is to maintain TWO projections of the posting table — one
bucketed by term for candidate generation, one bucketed by doc for
verification — because storage is cheap and shuffles are not.

Variant under test: the adopted w-bucketed table serves dfreq and the
prefix self-join (unchanged), while a SECOND copy bucketed(32) by
doc_id serves the per-doc size aggregate and both verification sides
(Spark satisfies a join on (id, w) with hash partitioning on the id
subset, so the doc_id bucketing covers the compound-key join too).

NOTE: the r13 doc_id-bucketed negative result replaced the w layout
entirely and predates the rep-level collapse + checkpoint removal;
this experiment ADDS the doc layout next to the w layout.

Cold subprocess per measurement, interleaved variants; output
identity asserted via sorted result hash.

Usage: python tools/exp_jaccard_dual_layout.py [sf_dir] [out_json]
       python tools/exp_jaccard_dual_layout.py --child {base|dual} SF_DIR

VERDICT (r15, measured): MARGINAL — not adopted. At 100x the dual
layout never lost but only split the pairs (55.3/54.55 a statistical
tie, 66.95/54.12 a win; medians 61.1 vs 54.3, ~1.13x); sf0.1 was a
wash inside ambient noise (21.8/25.7, 16.0/14.2). Output
hash-identical (exp_jaccard_dual_{sf01,100x}_r15.json). A second full
projection of the posting table (2x storage + build, forever) for a
~10% end-to-end win fails the fleet's adoption bar ("won every
interleaved cold pair"); the verification joins are output-bounded
(candidates only), so the doc-keyed side the bucketing serves is not
the dominant cost. The r13 negative result therefore stands for the
rep-level table too.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TBL_DOC = "exp_tokset_docbucket"


def _result_hash(rows) -> str:
    payload = "\n".join(
        f"{r.id_a}|{r.id_b}|{r.jaccard:.6f}" for r in sorted(rows)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _variant_dual(spark, sf_dir: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineeringproject_spark.queries.llm_text import (
        _PPJ_T,
        _staged_docg,
        _staged_tokset_wb,
    )

    tokset_w = spark.table(_staged_tokset_wb(spark, sf_dir))
    tokset_d = spark.table(TBL_DOC)
    docg = spark.read.parquet(_staged_docg(spark, sf_dir))
    reps = docg.groupBy("gh").agg(F.min("doc_id").alias("doc_id"))
    n = tokset_d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = tokset_w.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy("df", "w")
    r = (
        tokset_w.join(dfreq.hint("merge"), "w")
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
    ta = tokset_d.select(F.col("doc_id").alias("id_a"), "w")
    tb = tokset_d.select(F.col("doc_id").alias("id_b"), "w")
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
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.queries.llm_text import (
        _staged_docg,
        _staged_tokset_wb,
    )
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("exp_jaccard_dual")
    wb = _staged_tokset_wb(spark, sf_dir)  # untimed in both variants
    _staged_docg(spark, sf_dir)
    if variant == "dual":
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{TBL_DOC}", ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {TBL_DOC}")
        import tempfile

        path = tempfile.mkdtemp(prefix="deps_tokset_doc_")
        (
            spark.table(wb)
            .write.bucketBy(32, "doc_id")
            .sortBy("doc_id")
            .option("path", path)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(TBL_DOC)
        )
        t0 = time.perf_counter()
        rows = _variant_dual(spark, sf_dir).collect()
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
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/exp_jaccard_dual.json"
    runs = []
    for rep in range(2):
        for variant in ("base", "dual"):
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
        "method": (
            "cold subprocess per measurement; staging + both bucketed-table "
            "builds untimed"
        ),
        "sf_dir": sf_dir,
        "output_identical": len(hashes) == 1,
        "runs": runs,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out, "output_identical:", len(hashes) == 1)


if __name__ == "__main__":
    main()
