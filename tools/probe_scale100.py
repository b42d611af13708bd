#!/usr/bin/env python
"""Third-decade scale probe (VERDICT r10 item 3): time the four queries
whose quadratic shapes were capped in r10 at 1x / 10x / 100x data and
record the honesty metrics their caps trade on, so the approximation
cost at 100x is PRICED, not assumed. Usage:

    python tools/probe_scale100.py [out_json]

Expects the fixtures `tools/make_scale10.py` writes at
/tmp/deps_scale10 (x10) and /tmp/deps_scale100 (x100); 1x is
/root/testdata/sf0.1. Timing action is toPandas() — count() prunes
projected expressions (the r10 SimHash lesson), so every output column
is forced. Honesty metrics per query:

- knn_classifier_eval_lsh: the result's own coverage / accuracy rows
  (the _KNN_BUCKCAP=128 candidate cap lowers coverage as data grows —
  record the curve);
- tfidf_cosine_pairs: surviving posting-list mass under _TC_DFABS=512
  (sum of per-term df over kept terms) vs total token mass — how much
  of the corpus the absolute ceiling still scores;
- ann_ivfpq_topk: result rows (fixed top-k surface) — the _INIT_CAP
  bound holds nlist at 256 so time is the metric;
- session_overlap_top_pairs: candidate pair count implied by the
  hour-bucket blocking is internal; record result rows + time.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataengineeringproject_spark import registry  # noqa: E402
from dataengineeringproject_spark.session import get_spark  # noqa: E402

SCALES = {
    "1x": "/root/testdata/sf0.1",
    "10x": "/tmp/deps_scale10",
    "100x": "/tmp/deps_scale100",
}
QUERIES = [
    "ann_ivfpq_topk",
    "knn_classifier_eval_lsh",
    "tfidf_cosine_pairs",
    "session_overlap_top_pairs",
]


def _tfidf_kept_mass(spark, sf_dir: str) -> dict:
    """Fraction of (doc, term) postings the tfidf caps still score:
    sum(df) over terms with df*_TC_DFCAP <= n AND df <= _TC_DFABS,
    over sum(df) for all length->=3 lowercase tokens (the query's own
    tokenizer). Prices the absolute ceiling's coverage loss at scale."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.functions import text as X
    from dataengineeringproject_spark.queries.llm_text import (
        _TC_DFABS,
        _TC_DFCAP,
        _TC_MINLEN,
        _docs,
    )

    d = _docs(spark, sf_dir)
    n = d.count()
    tok = d.select(
        "doc_id", F.explode(X.tokens(F.lower(F.col("text")))).alias("w")
    ).filter(F.length("w") >= _TC_MINLEN)
    df = (
        tok.distinct().groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    )
    agg = df.agg(
        F.sum("df").alias("total"),
        F.sum(
            F.when(
                (F.col("df") * _TC_DFCAP <= n) & (F.col("df") <= _TC_DFABS),
                F.col("df"),
            ).otherwise(0)
        ).alias("kept"),
    ).collect()[0]
    return {
        "postings_total": int(agg["total"]),
        "postings_kept": int(agg["kept"]),
        "kept_frac": round(agg["kept"] / max(agg["total"], 1), 4),
    }


def _overlap_dropped_mass(spark, sf_dir: str) -> dict:
    """Honesty metric for session_overlap_top_pairs' _OVL_BUCKCAP
    (r12): re-derive the query's exploded (session, hour-bucket) frame
    and report how much the per-bucket concurrency cap cuts — kept vs
    total (session, bucket) rows, the number of over-cap buckets, and
    the max occupancy. Prices the semantic truncation at each scale
    (at sf0.1 max occupancy is 243 < 256, so nothing is dropped and
    provided-testdata results are byte-identical)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from dataengineeringproject_spark.queries.windows_q import (
        _GAP_MIN,
        _OVL_BUCKCAP,
    )
    from dataengineeringproject_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{_GAP_MIN} minutes").alias("win")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("win.start").alias("st"),
            F.col("win.end").alias("en"),
            F.date_trunc("day", "win.start").cast("date").alias("day"),
        )
    )
    e = sess.select(
        "day", "user_id", "st",
        (F.col("en").cast("long") - F.col("st").cast("long")).alias("len"),
        F.explode(
            F.sequence(
                F.expr("cast(st as long) div 3600"),
                F.expr("cast(en as long) div 3600"),
            )
        ).alias("hb"),
    )
    wcap = Window.partitionBy("day", "hb").orderBy(
        F.desc("len"), F.asc("user_id"), F.asc("st")
    )
    agg = (
        e.withColumn("rn", F.row_number().over(wcap))
        .groupBy("day", "hb")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.sum(
                F.when(F.col("rn") <= _OVL_BUCKCAP, 1).otherwise(0)
            ).alias("kept"),
        )
        .agg(
            F.sum("occ").alias("total"),
            F.sum("kept").alias("kept"),
            F.sum(
                F.when(F.col("occ") > _OVL_BUCKCAP, 1).otherwise(0)
            ).alias("buckets_over_cap"),
            F.count(F.lit(1)).alias("buckets"),
            F.max("occ").alias("max_occupancy"),
        )
        .collect()[0]
    )
    return {
        "cap": _OVL_BUCKCAP,
        "session_buckets_total": int(agg["total"]),
        "session_buckets_kept": int(agg["kept"]),
        "dropped_frac": round(1 - agg["kept"] / max(agg["total"], 1), 4),
        "buckets_over_cap": int(agg["buckets_over_cap"]),
        "buckets": int(agg["buckets"]),
        "max_occupancy": int(agg["max_occupancy"]),
    }


def _fuzzy_dropped_mass(spark, sf_dir: str) -> dict:
    """Honesty metric for fuzzy_pairs_blocked's _FUZ_BUCKCAP (r12):
    re-derive the rep-level (band, bkey) frame and report how much of
    the rep-band mass the per-bucket cap cuts — kept vs total rows,
    over-cap bucket count, max occupancy. Prices the semantic recall
    trade at each scale. On provided sf0.1 the cap DOES trim: max
    occupancy 529 > 256, 3 buckets over cap, ~4.8% of rep-band rows
    dropped (probe_scale100_battery_r12.json) — yet the OUTPUT stays
    row-identical to uncapped, because every surviving pair's members
    co-rank within the cap in some shared bucket (hash-matched at
    sf0.001/0.01/0.1 in fresh sessions; commit b234482). The earlier
    "223 < 256, no bite" claim used a wrong band-seed string."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.queries.curation import (
        _FUZ_BANDS,
        _FUZ_BUCKCAP,
        _FUZ_ROWS,
        _LEV_PREFIX,
        _docs,
    )

    d = _docs(spark, sf_dir)
    pfx = F.substring(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        1,
        _LEV_PREFIX,
    )
    reps = (
        d.select("doc_id", pfx.alias("pfx"))
        .groupBy("pfx")
        .agg(F.min("doc_id").alias("doc_id"))
    )

    def _band_min(b: int, r: int) -> str:
        return (
            f"array_min(transform(sequence(1, greatest(length(pfx) - 2, 1)), "
            f"i -> md5(concat('{b}r{r}|', substring(pfx, i, 3)))))"
        )

    band_keys = [
        F.expr(
            "concat(" + ", ".join(_band_min(b, r) for r in range(_FUZ_ROWS)) + ")"
        ).alias(f"bkey_{b}")
        for b in range(_FUZ_BANDS)
    ]
    k = reps.select("doc_id", *band_keys).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"bkey_{b}").alias("bkey")
                    )
                    for b in range(_FUZ_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")
    agg = (
        k.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("occ"))
        .agg(
            F.sum("occ").alias("total"),
            F.sum(F.least(F.col("occ"), F.lit(_FUZ_BUCKCAP))).alias("kept"),
            F.sum(
                F.when(F.col("occ") > _FUZ_BUCKCAP, 1).otherwise(0)
            ).alias("buckets_over_cap"),
            F.count(F.lit(1)).alias("buckets"),
            F.max("occ").alias("max_occupancy"),
        )
        .toPandas()
        .iloc[0]
    )
    return {
        "cap": _FUZ_BUCKCAP,
        "rep_band_rows_total": int(agg["total"]),
        "rep_band_rows_kept": int(agg["kept"]),
        "dropped_frac": round(1 - agg["kept"] / max(agg["total"], 1), 4),
        "buckets_over_cap": int(agg["buckets_over_cap"]),
        "buckets": int(agg["buckets"]),
        "max_occupancy": int(agg["max_occupancy"]),
    }


def _dbscan_dropped_mass(spark, sf_dir: str) -> dict:
    """Honesty metric for the DBSCAN family's _DBSCAN_CELLCAP (r13):
    re-derive the epsilon-grid cell occupancy and report how much of
    the build-side point mass the per-cell cap cuts — kept vs total
    points, over-cap cell count, max occupancy. Prices the region
    query's degree undercount at scale (a point in an over-cap cell is
    invisible as a NEIGHBOR beyond the cap, though it still probes).
    Provided sf0.1 max occupancy is 12 < 64, so the cap never binds
    there."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.functions import text as X
    from dataengineeringproject_spark.queries.advanced import (
        _DBSCAN_CELLCAP,
        _GEO_EPS,
        _GEO_EXTENT,
        _GEO_SEED,
    )
    from dataengineeringproject_spark.schemas import load_table

    u = load_table(spark, sf_dir, "events").select("user_id").distinct()
    x = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-x")
    y = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-y")
    occ = (
        u.select(
            (x % _GEO_EXTENT).alias("x"),
            (y % _GEO_EXTENT).alias("y"),
        )
        .select(
            F.expr(f"x div {_GEO_EPS}").alias("cx"),
            F.expr(f"y div {_GEO_EPS}").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("occ"))
        .agg(
            F.sum("occ").alias("total"),
            F.sum(F.least(F.col("occ"), F.lit(_DBSCAN_CELLCAP))).alias(
                "kept"
            ),
            F.sum(
                F.when(F.col("occ") > _DBSCAN_CELLCAP, 1).otherwise(0)
            ).alias("cells_over_cap"),
            F.count(F.lit(1)).alias("cells"),
            F.max("occ").alias("max_occupancy"),
        )
        .collect()[0]
    )
    return {
        "cell_cap": _DBSCAN_CELLCAP,
        "points_total": int(occ["total"]),
        "build_points_kept": int(occ["kept"]),
        "dropped_frac": round(1 - occ["kept"] / max(occ["total"], 1), 4),
        "cells_over_cap": int(occ["cells_over_cap"]),
        "cells": int(occ["cells"]),
        "max_occupancy": int(occ["max_occupancy"]),
    }


def _metrics(name: str, pdf) -> dict:
    out: dict = {"rows": int(len(pdf))}
    if name == "knn_classifier_eval_lsh" and len(pdf) == 1:
        # single-row stats frame: record every numeric column (n_test,
        # n_covered, n_correct, accuracy, coverage)
        for c in pdf.columns:
            v = pdf[c].iloc[0]
            out[c] = float(v) if hasattr(v, "__float__") else v
    return out


def main() -> None:
    # usage: probe_scale100.py [out_json] [--queries a,b,c] [--scales 1x,100x]
    global QUERIES
    args = sys.argv[1:]
    out_path = "/tmp/probe_scale100.json"
    scales = dict(SCALES)
    rest = []
    i = 0
    while i < len(args):
        if args[i] == "--queries":
            QUERIES = args[i + 1].split(","); i += 2
        elif args[i] == "--scales":
            keep = set(args[i + 1].split(",")); i += 2
            scales = {k: v for k, v in scales.items() if k in keep}
        else:
            rest.append(args[i]); i += 1
    if rest:
        out_path = rest[0]
    # r12: the probe session now uses the engine's stock configs, the
    # same session shape bench.py and the external driver run. The r11
    # 4 MB maxPartitionBytes override compensated for one-file
    # fixtures, but make_scale10.py has written 32 files per table
    # since r11 — and the override itself distorted measurements
    # (knn_classifier_eval_lsh at 100x: 126-186 s under 4 MB splits vs
    # ~50 s under the default in an otherwise identical fresh
    # session). Heavy pre-shuffle producers are protected by
    # ensure_min_parallelism in the queries themselves, where the
    # production code — not the probe harness — owns the guarantee.
    spark = get_spark("probe_scale100")
    qs = registry.queries()
    result: dict = {"method": "toPandas wall-clock, one warm session", "per_scale": {}}
    for label, d in scales.items():
        if not Path(d).exists():
            print("missing fixture:", d, "— run tools/make_scale10.py")
            continue
        rows = {}
        for name in QUERIES:
            # Per-query cache isolation (r12): queries that .cache()
            # internally (the ANN index builds) leak that state into
            # whatever runs next in the same session — measured 4x on
            # knn_classifier_eval_lsh at 100x when it followed
            # ann_ivfpq_topk (198 s polluted vs ~50 s fresh-session).
            # Wipe everything, then re-run the staging hooks so each
            # query is timed against exactly the staged state a fresh
            # driver session would see (staged artifacts are
            # index-build costs, not per-query costs — the bench.py
            # convention; the re-stage itself is outside the timer).
            spark.catalog.clearCache()
            registry.prestage(spark, d)
            t0 = time.perf_counter()
            pdf = qs[name](spark, d).toPandas()
            sec = time.perf_counter() - t0
            rows[name] = {"sec": round(sec, 3), **_metrics(name, pdf)}
            if name == "tfidf_cosine_pairs":
                rows[name].update(_tfidf_kept_mass(spark, d))
            if name == "session_overlap_top_pairs":
                rows[name].update(_overlap_dropped_mass(spark, d))
            if name == "fuzzy_pairs_blocked":
                rows[name].update(_fuzzy_dropped_mass(spark, d))
            if name in ("dbscan_clusters", "dbscan_core_points"):
                rows[name].update(_dbscan_dropped_mass(spark, d))
            print(f"{label:>4} {name}: {sec:.2f}s rows={len(pdf)}", flush=True)
        result["per_scale"][label] = rows
    for name in QUERIES:
        try:
            t1 = result["per_scale"]["1x"][name]["sec"]
            t10 = result["per_scale"]["10x"][name]["sec"]
            t100 = result["per_scale"]["100x"][name]["sec"]
            result.setdefault("ratios", {})[name] = {
                "10x_over_1x": round(t10 / max(t1, 1e-9), 2),
                "100x_over_10x": round(t100 / max(t10, 1e-9), 2),
                "100x_over_1x": round(t100 / max(t1, 1e-9), 2),
            }
        except KeyError:
            pass
    Path(out_path).write_text(json.dumps(result, indent=2) + "\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
