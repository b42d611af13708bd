#!/usr/bin/env python
"""Measured verdict on the per-middle in-set pair expansion for
link_prediction_adamic_adar (VERDICT r15 "Next round" item 1).

Hypothesis under test: the wedge enumeration — adjw (capped adjacency
x degree weight) self-joined with adjc on the middle node — pays for
(a) a separate `deg` aggregate (full shuffle of adj by u), (b) a
row_number window cap (shuffle of adj by w + sort), (c) the self-join
itself plus the (na, nb) aggregate exchange. Because the per-middle
weight au = round(1e9/ln(deg(w))) depends ONLY on the middle w, and
the capped neighbor list is <= _AA_MIDCAP = 32 entries, the whole
middle stage collapses into ONE shuffle of adj by w: a count-over-
window degree + row_number cap in the same sorted pass, a <=32-element
sorted neighbor list per middle, and an in-set ordered-pair expansion
(corpus_similarity_minhash's r15 pattern, guide §2.4/§3) that replaces
the self-join outright. deg's by-u shuffle and the self-join disappear
from the plan.

Exact equivalence argument (pinned by tests/test_r16_opt.py):
- window count(*) over (partition by w) == deg(w) because adj holds
  both directions of every distinct pair, so |{rows: u=w}| ==
  |{rows: w=w}|;
- sort_array(collect_list(u)) over the rn <= cap survivors == the
  first cap neighbors by u asc == adjc's u set for that w;
- ordered in-set pairs (x,y), x earlier in the sorted list, == the
  self-join's na < nb pairs from the same middle;
- the a-side's deg >= 2 filter is implied: a pair needs >= 2 capped
  neighbors, and capped size >= 2 -> deg >= 2.

Cold subprocess per measurement, interleaved variants, output
identity via sorted full-row md5.

Usage: python tools/exp_aa_inset.py [sf_dir] [out_json] [reps]
       python tools/exp_aa_inset.py --child {base|inset} SF_DIR
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
        "|".join(str(v) for v in r) for r in sorted(tuple(r) for r in rows)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _variant_base(spark, sf_dir: str):
    """The r15-committed formulation: deg aggregate + window cap +
    wedge self-join (verbatim copy, kept here so the A/B stays
    reproducible after the production function adopts the winner)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineeringproject_spark.queries.graph_q import (
        _AA_MIDCAP,
        _LP_TOPK,
    )
    from dataengineeringproject_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    s = li.select("l_orderkey", "l_partkey").distinct()
    a = s.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("sa")
    )
    b = s.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("sb")
    )
    p = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select("sa", "sb")
        .distinct()
        .cache()
    )
    adj = p.select(F.col("sa").alias("u"), F.col("sb").alias("w")).unionAll(
        p.select(F.col("sb").alias("u"), F.col("sa").alias("w"))
    )
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    wcap = Window.partitionBy("w").orderBy(F.asc("u"))
    adjc = (
        adj.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= _AA_MIDCAP)
        .drop("rn")
    )
    adjw = adjc.join(
        deg.filter(F.col("d") >= 2), adjc["w"] == deg["node"]
    ).select(
        "u",
        "w",
        F.round(1e9 / F.log(F.col("d"))).cast("long").alias("au"),
    )
    right = adjc.select(F.col("u").alias("nb"), F.col("w").alias("wb"))
    wedge = (
        adjw.select(F.col("u").alias("na"), "w", "au")
        .join(right, F.col("w") == F.col("wb"))
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("au").cast("long").alias("aau"),
        )
    )
    cand = wedge.join(
        p,
        (wedge["na"] == p["sa"]) & (wedge["nb"] == p["sb"]),
        "left_anti",
    )
    w = Window.orderBy(F.desc("aau"), F.desc("cn"), F.asc("na"), F.asc("nb"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _LP_TOPK)
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("na").alias("node_a"),
            F.col("nb").alias("node_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.round(F.col("aau") / 1e9, 6).alias("adamic_adar"),
        )
    )


def _variant_inset(spark, sf_dir: str):
    """Candidate: one by-w shuffle for the whole middle stage (degree
    via count-over-window, cap via row_number in the same sorted pass),
    in-set ordered-pair expansion instead of the self-join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineeringproject_spark.queries.graph_q import (
        _AA_MIDCAP,
        _LP_TOPK,
    )
    from dataengineeringproject_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    s = li.select("l_orderkey", "l_partkey").distinct()
    a = s.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("sa")
    )
    b = s.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("sb")
    )
    p = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select("sa", "sb")
        .distinct()
        .cache()
    )
    adj = p.select(F.col("sa").alias("u"), F.col("sb").alias("w")).unionAll(
        p.select(F.col("sb").alias("u"), F.col("sa").alias("w"))
    )
    wcap = Window.partitionBy("w").orderBy(F.asc("u"))
    wd = Window.partitionBy("w")
    capped = (
        adj.withColumn("rn", F.row_number().over(wcap))
        .withColumn("d", F.count(F.lit(1)).over(wd))
        .filter(F.col("rn") <= _AA_MIDCAP)
    )
    mid = (
        capped.groupBy("w", "d")
        .agg(F.sort_array(F.collect_list("u")).alias("ns"))
        .filter(F.size("ns") >= 2)
        .select(
            F.round(1e9 / F.log(F.col("d"))).cast("long").alias("au"),
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> "
                    "transform(slice(ns, i + 2, size(ns)), "
                    "y -> struct(x AS na, y AS nb))))"
                )
            ).alias("pr"),
        )
    )
    wedge = mid.groupBy(
        F.col("pr.na").alias("na"), F.col("pr.nb").alias("nb")
    ).agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum("au").cast("long").alias("aau"),
    )
    cand = wedge.join(
        p,
        (wedge["na"] == p["sa"]) & (wedge["nb"] == p["sb"]),
        "left_anti",
    )
    w = Window.orderBy(F.desc("aau"), F.desc("cn"), F.asc("na"), F.asc("nb"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _LP_TOPK)
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("na").alias("node_a"),
            F.col("nb").alias("node_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.round(F.col("aau") / 1e9, 6).alias("adamic_adar"),
        )
    )


def _variant_inset2(spark, sf_dir: str):
    """inset + basket-aggregate pair generation: the per-order item
    pairs come from an in-set expansion of the per-order sorted
    distinct item set (collect_set folds s's distinct into the same
    aggregate), replacing the a x b self-join on l_orderkey. TPC-H
    baskets are structurally tiny (<= 7 lineitems), so the expansion
    is bounded; p itself (distinct co-occurring pairs) is unchanged."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineeringproject_spark.queries.graph_q import (
        _AA_MIDCAP,
        _LP_TOPK,
    )
    from dataengineeringproject_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .filter(F.size("items") >= 2)
    )
    p = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS sa, y AS sb))))"
                )
            ).alias("pr")
        )
        .select(F.col("pr.sa").alias("sa"), F.col("pr.sb").alias("sb"))
        .distinct()
        .cache()
    )
    adj = p.select(F.col("sa").alias("u"), F.col("sb").alias("w")).unionAll(
        p.select(F.col("sb").alias("u"), F.col("sa").alias("w"))
    )
    wcap = Window.partitionBy("w").orderBy(F.asc("u"))
    wd = Window.partitionBy("w")
    capped = (
        adj.withColumn("rn", F.row_number().over(wcap))
        .withColumn("d", F.count(F.lit(1)).over(wd))
        .filter(F.col("rn") <= _AA_MIDCAP)
    )
    mid = (
        capped.groupBy("w", "d")
        .agg(F.sort_array(F.collect_list("u")).alias("ns"))
        .filter(F.size("ns") >= 2)
        .select(
            F.round(1e9 / F.log(F.col("d"))).cast("long").alias("au"),
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> "
                    "transform(slice(ns, i + 2, size(ns)), "
                    "y -> struct(x AS na, y AS nb))))"
                )
            ).alias("pr"),
        )
    )
    wedge = mid.groupBy(
        F.col("pr.na").alias("na"), F.col("pr.nb").alias("nb")
    ).agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum("au").cast("long").alias("aau"),
    )
    cand = wedge.join(
        p,
        (wedge["na"] == p["sa"]) & (wedge["nb"] == p["sb"]),
        "left_anti",
    )
    w = Window.orderBy(F.desc("aau"), F.desc("cn"), F.asc("na"), F.asc("nb"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _LP_TOPK)
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("na").alias("node_a"),
            F.col("nb").alias("node_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.round(F.col("aau") / 1e9, 6).alias("adamic_adar"),
        )
    )


VARIANTS = {
    "base": _variant_base,
    "inset": _variant_inset,
    "inset2": _variant_inset2,
}


def child(variant: str, sf_dir: str) -> None:
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("exp_aa_inset")
    t0 = time.perf_counter()
    rows = VARIANTS[variant](spark, sf_dir).collect()
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
    out = args[1] if len(args) > 1 else "/tmp/exp_aa_inset.json"
    reps = int(args[2]) if len(args) > 2 else 3
    runs = []
    variants = ("base", "inset", "inset2")
    if "--variants" in sys.argv:
        variants = tuple(
            sys.argv[sys.argv.index("--variants") + 1].split(",")
        )
    for rep in range(reps):
        for variant in variants:
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
        "method": "cold subprocess per measurement, interleaved variants",
        "sf_dir": sf_dir,
        "output_identical": len(hashes) == 1,
        "runs": runs,
    }
    Path(out).write_text(json.dumps(art, indent=1) + "\n")
    print("wrote", out, "output_identical:", len(hashes) == 1)


if __name__ == "__main__":
    main()
