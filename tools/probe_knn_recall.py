#!/usr/bin/env python
"""Price the kNN-LSH accuracy drop at scale (VERDICT r11 item 3): the
100x battery showed `knn_classifier_eval_lsh` accuracy falling
0.55 -> 0.33 with coverage 1.0, and left two candidate explanations
unseparated:

  (a) the `_KNN_BUCKCAP` candidate truncation drops true neighbors
      (cap-induced recall loss), or
  (b) the salted 100x fixture simply has harder geometry (the exact
      classifier would ALSO fall).

This probe separates them with exact ground truth on a deterministic
test-vector sample at 1x / 10x / 100x. Per scale it reports:

- acc_exact:   label accuracy of the EXACT top-K vote on the sample —
               the geometry ceiling. If this falls with scale, (b).
- acc_lsh:     label accuracy of the production capped-LSH vote on the
               same sample. The gap acc_exact - acc_lsh is what the
               index (bucketing + cap) costs.
- recall_bucket: mean |exact-top-K ∩ same-bucket-UNCAPPED-top-K| / K —
               recall ceiling of the 4-plane bucketing alone.
- recall_capped[cap]: same with the per-bucket crn <= cap truncation,
               for cap in CAPS — the cap response curve. If
               recall_bucket is high but recall_capped[128] is low and
               rises with cap, (a).
- dropped_train_frac[cap]: fraction of train vectors invisible to ANY
               probe under the cap — the honesty metric for the
               truncation itself.

Sampling is deterministic (xxhash64(test_id) % mod == 0, mod chosen so
~SAMPLE_TARGET tests survive per scale); both classifiers run on the
identical sample so the comparison is paired. All ranking orders match
the registered queries: (rounded-6 cosine DESC, train_id ASC) for
neighbors, (votes DESC, best_cos DESC, cand ASC) for the vote.

Usage: python tools/probe_knn_recall.py [out_json]
Writes probe_knn_recall_r12.json by default.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from dataengineeringproject_spark.functions import text as X  # noqa: E402
from dataengineeringproject_spark.operators import similarity as S  # noqa: E402
from dataengineeringproject_spark.queries.llm_vectors import (  # noqa: E402
    _KNN_BUCKCAP,
    _KNN_K,
    _KNN_SEED,
    _KNN_TRAIN,
    _N_DIMS,
    _N_PLANES,
    _knn_lsh_cap,
)
from dataengineeringproject_spark.schemas import load_table  # noqa: E402
from dataengineeringproject_spark.session import get_spark  # noqa: E402

SCALES = {
    "1x": "/root/testdata/sf0.1",
    "10x": "/tmp/deps_scale10",
    "100x": "/tmp/deps_scale100",
}
SAMPLE_TARGET = 300
CAPS = [_KNN_BUCKCAP, 4 * _KNN_BUCKCAP, 16 * _KNN_BUCKCAP]


def _vote(top):
    """(test_id, actual, cand, cosine, rn<=K) -> (test_id, ok) under the
    registered queries' vote order."""
    vote = top.groupBy("test_id", "actual", "cand").agg(
        F.count(F.lit(1)).alias("votes"), F.max("cosine").alias("best_cos")
    )
    wv = Window.partitionBy("test_id").orderBy(
        F.desc("votes"), F.desc("best_cos"), F.asc("cand")
    )
    return (
        vote.withColumn("vrn", F.row_number().over(wv))
        .filter(F.col("vrn") == 1)
        .select(
            "test_id",
            (F.col("actual") == F.col("cand")).cast("int").alias("ok"),
        )
    )


def _topk(pairs, k):
    wt = Window.partitionBy("test_id").orderBy(
        F.desc("cosine"), F.asc("train_id")
    )
    return pairs.withColumn("rn", F.row_number().over(wt)).filter(
        F.col("rn") <= k
    )


def probe_scale(spark, sf_dir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    planes = S.hyperplanes(_N_PLANES, _N_DIMS)
    v = S._with_norm(
        emb.select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
            S.lsh_bucket(
                F.col("embedding").cast("array<double>"), planes
            ).alias("bucket"),
            (
                X.token_hash(F.col("vec_id").cast("string"), seed=_KNN_SEED)
                % 100
            ).alias("bkt"),
        )
    )
    v = S.ensure_min_parallelism(v, "vec_id").cache()
    n_test = v.filter(F.col("bkt") >= _KNN_TRAIN).count()
    n_train = v.filter(F.col("bkt") < _KNN_TRAIN).count()
    mod = max(1, n_test // SAMPLE_TARGET)
    te = (
        v.filter(F.col("bkt") >= _KNN_TRAIN)
        .filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0)
        .select(
            F.col("vec_id").alias("test_id"),
            F.col("label").alias("actual"),
            F.col("v").alias("tv"),
            F.col("nrm").alias("tnrm"),
            "bucket",
        )
        .cache()
    )
    n_sample = te.count()
    tr = v.filter(F.col("bkt") < _KNN_TRAIN).select(
        F.col("vec_id").alias("train_id"),
        F.col("label").alias("cand"),
        F.col("v").alias("rv"),
        F.col("nrm").alias("rnrm"),
        F.col("bucket").alias("rbucket"),
    )
    wcap = Window.partitionBy("rbucket").orderBy(F.asc("train_id"))
    tr = tr.withColumn("crn", F.row_number().over(wcap)).cache()

    cos = F.round(
        S._cosine_pre(F.col("tv"), F.col("rv"), F.col("tnrm"), F.col("rnrm")),
        6,
    ).alias("cosine")

    # exact ground truth: sample x ALL train.
    exact_pairs = te.crossJoin(tr).select(
        "test_id", "actual", "train_id", "cand", cos
    )
    exact_top = _topk(exact_pairs, _KNN_K).cache()
    acc_exact = _vote(exact_top).agg(F.avg("ok")).collect()[0][0]
    exact_ids = exact_top.select("test_id", "train_id")

    # same-bucket candidates (the production probe), cap swept.
    bpairs = (
        te.join(tr, te.bucket == tr.rbucket)
        .select("test_id", "actual", "train_id", "cand", "crn", cos)
        .cache()
    )
    cap_prod = _knn_lsh_cap(n_train)
    out = {
        "sf_dir": sf_dir,
        "n_test": n_test,
        "n_train": n_train,
        "n_sample": n_sample,
        "sample_mod": mod,
        "cap_production": cap_prod,
        "acc_exact": round(float(acc_exact), 4),
        "recall_capped": {},
        "acc_lsh": {},
        "dropped_train_frac": {},
    }
    bucket_top = _topk(bpairs, _KNN_K)
    hits = (
        exact_ids.join(
            bucket_top.select("test_id", "train_id"), ["test_id", "train_id"]
        ).count()
    )
    out["recall_bucket"] = round(hits / (n_sample * _KNN_K), 4)
    for cap in sorted(set(CAPS + [cap_prod])):
        cpairs = bpairs.filter(F.col("crn") <= cap)
        ctop = _topk(cpairs, _KNN_K).cache()
        chits = (
            exact_ids.join(
                ctop.select("test_id", "train_id"), ["test_id", "train_id"]
            ).count()
        )
        out["recall_capped"][str(cap)] = round(chits / (n_sample * _KNN_K), 4)
        acc = _vote(ctop).agg(F.avg("ok")).collect()[0][0]
        out["acc_lsh"][str(cap)] = round(float(acc), 4) if acc is not None else None
        kept = tr.filter(F.col("crn") <= cap).count()
        out["dropped_train_frac"][str(cap)] = round(1 - kept / n_train, 4)
        ctop.unpersist()
    for df in (exact_top, bpairs, te, tr, v):
        df.unpersist()
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "probe_knn_recall_r12.json"
    spark = get_spark("probe_knn_recall")
    results = {}
    for name, sf_dir in SCALES.items():
        if not Path(sf_dir).exists():
            results[name] = {"skipped": f"{sf_dir} missing"}
            continue
        t0 = time.time()
        results[name] = probe_scale(spark, sf_dir)
        results[name]["probe_sec"] = round(time.time() - t0, 1)
        print(name, json.dumps(results[name]))
    Path(out_path).write_text(json.dumps(results, indent=2) + "\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
