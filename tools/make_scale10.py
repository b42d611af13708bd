#!/usr/bin/env python
"""Synthesize a 10x copy of an sf directory into /tmp for scale-trend
measurements beyond the provided testdata (the §8.1 method, now kept
as a tool). Usage:

    python tools/make_scale10.py [src_sf_dir] [dst_dir] [copies]

defaults: /root/testdata/sf0.1 -> /tmp/deps_scale10 x10.

Design rules (what makes the copy honest for SHAPE measurement):
- relational tables: key-offset copies (FKs shifted coherently), so
  joins grow linearly and no cross-copy edges appear;
- events: user_id/event_id offset AND ts shifted by +copy days — more
  users and a longer history, never cross-copy sessions/day-blocks;
- documents: doc_id offset + POSITIONAL token salting (copy k salts
  token positions where i % 5 == k % 5 with a copy tag): cross-copy
  shingle Jaccard collapses (no artificial near-dup blowup between
  identical copies — 10 identical copies would inflate LSH pairs 45x)
  while within-copy dup structure is preserved (pair members share the
  same positions, so their mutual similarity survives);
- embeddings: vec_id offset + one deterministic dimension nudged per
  copy (breaks exact-tie degeneracy, keeps geometry).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataengineeringproject_spark.schemas import load_table  # noqa: E402
from dataengineeringproject_spark.session import get_spark  # noqa: E402

OFF = 10_000_000  # key offset stride between copies


def _copies(df, n):
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__k"), "*"
    )


def main() -> None:
    srcd = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/deps_scale10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make_scale10")
    k = F.col("__k")

    def write(df, name):
        # 32 output files: the explode-copies pipeline is narrow, so
        # without this the whole fixture lands in ONE file with ONE
        # row group — and parquet parallelism is row-group-bound, so
        # every downstream map stage would run single-task no matter
        # the core count (r11 forensics: 45 s single-threaded for work
        # 32 cores do in ~2 s). Real N×-scale tables have thousands of
        # row groups; the fixture must too.
        df.drop("__k").repartition(32).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        print("wrote", name)

    for name in ("region", "nation", "supplier", "part", "customer"):
        # dimensions stay 1x: the fact growth is what scale tests probe,
        # and replicated dims would break FK semantics
        load_table(spark, srcd, name).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        print("copied", name)

    o = _copies(load_table(spark, srcd, "orders"), n)
    write(
        o.withColumn("o_orderkey", F.col("o_orderkey") + k * OFF),
        "orders",
    )
    li = _copies(load_table(spark, srcd, "lineitem"), n)
    write(
        li.withColumn("l_orderkey", F.col("l_orderkey") + k * OFF),
        "lineitem",
    )

    ev = _copies(load_table(spark, srcd, "events"), n)
    write(
        ev.withColumn("event_id", F.col("event_id") + k * OFF)
        .withColumn("user_id", F.col("user_id") + k * OFF)
        .withColumn("ts", F.timestamp_micros(
            F.unix_micros("ts") + k.cast("long") * F.lit(86_400_000_000)
        )),
        "events",
    )

    d = _copies(load_table(spark, srcd, "documents"), n)
    salted = F.array_join(
        F.transform(
            F.split("text", " "),
            lambda t, i: F.when(
                i % 5 == k % 5, F.concat(t, F.lit("x"), k.cast("string"))
            ).otherwise(t),
        ),
        " ",
    )
    write(
        d.withColumn("doc_id", F.col("doc_id") + k * OFF)
        .withColumn("text", salted)
        .withColumn("n_chars", F.length("text")),
        "documents",
    )

    em = _copies(load_table(spark, srcd, "embeddings"), n)
    dim0 = (F.col("embedding")[0] + k.cast("float") * F.lit(0.01)).cast("float")
    write(
        em.withColumn("vec_id", F.col("vec_id") + k * OFF)
        .withColumn(
            "embedding",
            F.concat(F.array(dim0), F.slice("embedding", 2, 10_000)),
        ),
        "embeddings",
    )
    print("done:", dst)


if __name__ == "__main__":
    main()
