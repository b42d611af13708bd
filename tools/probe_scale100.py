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


def _ari_from_contingency(cont: dict[tuple, int]) -> float:
    """Adjusted Rand Index from a {(label_a, label_b): n} contingency
    table (exact, no sklearn). Noise (-1) is treated as its own label —
    the strict reading: a point the capped run calls noise but the
    uncapped run clusters counts against agreement."""
    from math import comb

    rows: dict = {}
    cols: dict = {}
    n = 0
    sum_comb = 0
    for (a, b), c in cont.items():
        rows[a] = rows.get(a, 0) + c
        cols[b] = cols.get(b, 0) + c
        n += c
        sum_comb += comb(c, 2)
    sum_rows = sum(comb(c, 2) for c in rows.values())
    sum_cols = sum(comb(c, 2) for c in cols.values())
    total = comb(n, 2)
    if total == 0:
        return 1.0
    expected = sum_rows * sum_cols / total
    max_index = (sum_rows + sum_cols) / 2
    if max_index == expected:
        return 1.0
    return (sum_comb - expected) / (max_index - expected)


def _dbscan_role_labels(spark, sf_dir: str, cap: int):
    """Run the production _dbscan_labels pipeline under a temporary
    cell cap and return a pandas frame (user_id, cluster, role) —
    shared by the agreement metric, the cap-sensitivity curve, and the
    mixed-density probe (r15 refactor of three identical closures)."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.queries import advanced as A

    prev = A._DBSCAN_CELLCAP
    A._DBSCAN_CELLCAP = cap
    try:
        pt, lab = A._dbscan_labels(spark, sf_dir)
        return (
            pt.select("user_id")
            .join(lab, "user_id", "left")
            .select(
                "user_id",
                F.coalesce(F.col("cluster"), F.lit(-1)).alias("cluster"),
                F.when(F.col("is_core"), "core")
                .when(F.col("cluster").isNotNull(), "border")
                .otherwise("noise")
                .alias("role"),
            )
            .toPandas()
            .set_index("user_id")
        )
    finally:
        A._DBSCAN_CELLCAP = prev


def _dbscan_agreement(spark, sf_dir: str) -> dict:
    """Capped-vs-uncapped cluster-assignment agreement (VERDICT r13
    item 3): the dropped-mass metric says how many build points the
    _DBSCAN_CELLCAP discards, but not what that costs in ASSIGNMENT
    quality — the analog of fuzzy_recall_blocked for this family. Runs
    the identical _dbscan_labels pipeline twice (production cap vs an
    effectively-infinite cap), then reports per-point role agreement
    (core/border/noise) and ARI over cluster labels (noise as its own
    label). Only call where the uncapped run is feasible (1x, 10x, the
    dense fixture) — at 100x the uncapped candidate stream is the
    O(density^2) blow-up the cap exists to prevent."""
    from dataengineeringproject_spark.queries import advanced as A

    prod_cap = A._DBSCAN_CELLCAP
    capped = _dbscan_role_labels(spark, sf_dir, prod_cap)
    unc = _dbscan_role_labels(spark, sf_dir, 1 << 31)
    m = capped.join(unc, lsuffix="_c", rsuffix="_u")
    cont = (
        m.groupby(["cluster_c", "cluster_u"]).size().to_dict()
    )
    return {
        "cell_cap": prod_cap,
        "n_points": int(len(m)),
        "role_agreement": round(
            float((m["role_c"] == m["role_u"]).mean()), 4
        ),
        "ari_vs_uncapped": round(_ari_from_contingency(cont), 4),
        "n_clusters_capped": int(m["cluster_c"].nunique()),
        "n_clusters_uncapped": int(m["cluster_u"].nunique()),
    }


def _dbscan_cap_curve(spark, sf_dir: str, caps: list[int]) -> dict:
    """Agreement-vs-cap sensitivity curve on PROVIDED data (r14
    follow-through on the agreement metric): production cap 64 never
    binds at sf0.1 (max occupancy 12), so sweep caps BELOW occupancy
    where the truncation genuinely bites real data, comparing each
    capped assignment against uncapped. Answers 'how low could the cap
    go before assignments change' — the operating-margin reading the
    single production-cap number can't give."""
    unc = _dbscan_role_labels(spark, sf_dir, 1 << 31)
    out = {}
    for cap in caps:
        capped = _dbscan_role_labels(spark, sf_dir, cap)
        m = capped.join(unc, lsuffix="_c", rsuffix="_u")
        cont = m.groupby(["cluster_c", "cluster_u"]).size().to_dict()
        out[str(cap)] = {
            "role_agreement": round(float((m["role_c"] == m["role_u"]).mean()), 4),
            "ari_vs_uncapped": round(_ari_from_contingency(cont), 4),
            "n_clusters_capped": int(m["cluster_c"].nunique()),
        }
    return out


def _make_dense_fixture(spark, n_users: int = 40_000) -> str:
    """Synthetic dense DBSCAN fixture (VERDICT r13 item 3): n_users
    distinct ids hashed into the fixed _GEO_EXTENT space gives mean
    cell occupancy ~n/289 (~138 at 40k) — the 64 cap bites HARD
    (unlike provided testdata, max occupancy 12) while the uncapped
    run stays feasible (~9·m²·cells ≈ 5e7 candidates). Events schema
    matches load_table's contract; one row per user is all the DBSCAN
    family reads (it starts from DISTINCT user_id)."""
    import pyspark.sql.functions as F

    d = "/tmp/deps_dbscan_dense"
    if (Path(d) / "events.parquet").exists():
        return d
    Path(d).mkdir(parents=True, exist_ok=True)
    df = (
        spark.range(1, n_users + 1)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            F.col("id").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    df.coalesce(8).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def _make_mixed_fixture(spark) -> str:
    """Mixed-density DBSCAN fixture (VERDICT r14 item 6): a dense core
    AND a sparse halo in ONE dataset — the single regime uniform id
    hashing cannot produce, and the cap's only unpriced geometry (a
    capped dense core could in principle shed border points into the
    surrounding sparse field, or starve halo points of their
    neighbors' build rows).

    Points are still placed by the PRODUCTION hash (user_id -> (x, y)
    via token_hash, so the fixture exercises the real code path);
    non-uniformity comes from rejection-sampling the ID SPACE: scan
    ids 1..100_000, keep every id whose hash lands inside the 3x3-cell
    core square [0, 3*eps)^2 (~3.2% of ids => ~360 points per core
    cell, 5.6x over the 64 cap), and keep ids elsewhere only when
    id % 89 == 0 (~1.1k halo points over 280 cells, ~4 per cell —
    around the minpts=3 threshold, so the halo carries a genuine
    core/border/noise mix). Uncapped stays feasible: ~9 * 360^2 * 9
    ~ 1.1e7 core candidates."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.functions import text as X
    from dataengineeringproject_spark.queries.advanced import (
        _GEO_EPS,
        _GEO_EXTENT,
        _GEO_SEED,
    )

    d = "/tmp/deps_dbscan_mixed"
    if (Path(d) / "events.parquet").exists():
        return d
    Path(d).mkdir(parents=True, exist_ok=True)
    ids = spark.range(1, 100_001).select(F.col("id").alias("user_id"))
    x = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-x")
    y = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-y")
    core_lim = 3 * _GEO_EPS
    pts = ids.select(
        "user_id",
        (x % _GEO_EXTENT).alias("x"),
        (y % _GEO_EXTENT).alias("y"),
    )
    kept = pts.filter(
        ((F.col("x") < core_lim) & (F.col("y") < core_lim))
        | (F.col("user_id") % 89 == 0)
    )
    df = kept.select(
        F.col("user_id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("user_id")).alias(
            "ts"
        ),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    df.coalesce(8).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def _dbscan_mixed_agreement(spark, d: str) -> dict:
    """Capped-vs-uncapped agreement on the mixed fixture, SPLIT BY
    REGIME (core square vs halo): the global ARI can hide a localized
    halo failure behind the much larger core population, so each
    regime gets its own role-agreement and ARI."""
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.functions import text as X
    from dataengineeringproject_spark.queries import advanced as A

    capped = _dbscan_role_labels(spark, d, A._DBSCAN_CELLCAP)
    unc = _dbscan_role_labels(spark, d, 1 << 31)
    m = capped.join(unc, lsuffix="_c", rsuffix="_u").reset_index()
    core_lim = 3 * A._GEO_EPS
    regime = (
        spark.createDataFrame(m[["user_id"]])
        .select(
            "user_id",
            (
                (
                    X.token_hash(
                        F.col("user_id").cast("string"),
                        seed=A._GEO_SEED + "-x",
                    )
                    % A._GEO_EXTENT
                    < core_lim
                )
                & (
                    X.token_hash(
                        F.col("user_id").cast("string"),
                        seed=A._GEO_SEED + "-y",
                    )
                    % A._GEO_EXTENT
                    < core_lim
                )
            ).alias("in_core"),
        )
        .toPandas()
    )
    m = m.merge(regime, on="user_id")
    out = {"cell_cap": A._DBSCAN_CELLCAP, "n_points": int(len(m))}
    for label, sub in (
        ("overall", m),
        ("core_region", m[m["in_core"]]),
        ("halo_region", m[~m["in_core"]]),
    ):
        cont = sub.groupby(["cluster_c", "cluster_u"]).size().to_dict()
        out[label] = {
            "n_points": int(len(sub)),
            "role_agreement": round(
                float((sub["role_c"] == sub["role_u"]).mean()), 4
            ),
            "ari_vs_uncapped": round(_ari_from_contingency(cont), 4),
            "n_clusters_capped": int(sub["cluster_c"].nunique()),
            "n_clusters_uncapped": int(sub["cluster_u"].nunique()),
        }
    return out


def _metrics(name: str, pdf) -> dict:
    out: dict = {"rows": int(len(pdf))}
    if name == "knn_classifier_eval_lsh" and len(pdf) == 1:
        # single-row stats frame: record every numeric column (n_test,
        # n_covered, n_correct, accuracy, coverage)
        for c in pdf.columns:
            v = pdf[c].iloc[0]
            out[c] = float(v) if hasattr(v, "__float__") else v
    return out


def _measure_one(label: str, d: str, name: str, do_prestage: bool = True) -> dict:
    """One COLD measurement: fresh session (this process is a fresh
    JVM when invoked via --child), staging hooks untimed, then the
    timed toPandas + the family's honesty metrics (untimed).

    r12 note kept for the record: the probe session uses the engine's
    stock configs — the same session shape bench.py and the external
    driver run (the r11 4 MB maxPartitionBytes override distorted
    measurements)."""
    spark = get_spark("probe_scale100")
    qs = registry.queries()
    if do_prestage:
        registry.prestage(spark, d)
    t0 = time.perf_counter()
    pdf = qs[name](spark, d).toPandas()
    sec = time.perf_counter() - t0
    row = {"sec": round(sec, 3), **_metrics(name, pdf)}
    if name == "tfidf_cosine_pairs":
        row.update(_tfidf_kept_mass(spark, d))
    if name == "session_overlap_top_pairs":
        row.update(_overlap_dropped_mass(spark, d))
    if name == "fuzzy_pairs_blocked":
        row.update(_fuzzy_dropped_mass(spark, d))
    if name in ("dbscan_clusters", "dbscan_core_points"):
        row.update(_dbscan_dropped_mass(spark, d))
        # assignment-quality counterweight to the dropped-mass number
        # (VERDICT r13 item 3) — only where uncapped is feasible
        if name == "dbscan_clusters" and label in ("1x", "10x", "dense"):
            row["agreement"] = _dbscan_agreement(spark, d)
    return row


def main() -> None:
    # usage: probe_scale100.py [out_json] [--queries a,b,c] [--scales 1x,100x]
    #        probe_scale100.py --child <label> <dir> <query>   (internal)
    #        probe_scale100.py --dbscan-dense [out_json]
    global QUERIES
    args = sys.argv[1:]

    if "--child" in args:
        i = args.index("--child")
        label, d, name = args[i + 1], args[i + 2], args[i + 3]
        print("RESULT " + json.dumps({name: _measure_one(label, d, name)}))
        return

    if "--dbscan-cap-curve" in args:
        i = args.index("--dbscan-cap-curve")
        out = args[i + 1] if len(args) > i + 1 else "/tmp/probe_dbscan_curve.json"
        spark = get_spark("probe_scale100")
        sf_dir = "/root/testdata/sf0.1"
        curve = _dbscan_cap_curve(spark, sf_dir, caps=[2, 3, 4, 6, 8, 12])
        art = {
            "sf_dir": sf_dir,
            "note": (
                "max cell occupancy 12 at sf0.1, so caps below it bind on "
                "real data; production cap is 64"
            ),
            "agreement_vs_cap": curve,
        }
        Path(out).write_text(json.dumps(art, indent=2) + "\n")
        print("wrote", out)
        return

    if "--dbscan-mixed" in args:
        # dense core + sparse halo in one dataset (VERDICT r14 item 6)
        # — the cap binds only in the core square; the per-regime
        # split shows whether capping the core disturbs halo labels
        out = args[args.index("--dbscan-mixed") + 1] if len(
            args
        ) > args.index("--dbscan-mixed") + 1 else "/tmp/probe_dbscan_mixed.json"
        spark = get_spark("probe_scale100")
        d = _make_mixed_fixture(spark)
        row = _measure_one("mixed", d, "dbscan_clusters", do_prestage=False)
        row["agreement_by_regime"] = _dbscan_mixed_agreement(spark, d)
        Path(out).write_text(json.dumps({"mixed": row}, indent=2) + "\n")
        print("wrote", out)
        return

    if "--dbscan-dense" in args:
        # synthetic dense fixture where the cell cap bites hard (mean
        # occupancy ~138 >> cap 64) but uncapped stays feasible — the
        # agreement number that prices the 100x build-point drop
        out = args[args.index("--dbscan-dense") + 1] if len(
            args
        ) > args.index("--dbscan-dense") + 1 else "/tmp/probe_dbscan_dense.json"
        spark = get_spark("probe_scale100")
        d = _make_dense_fixture(spark)
        # events-only fixture: skip the corpus staging hooks (the
        # DBSCAN family reads nothing staged)
        row = _measure_one("dense", d, "dbscan_clusters", do_prestage=False)
        Path(out).write_text(json.dumps({"dense": row}, indent=2) + "\n")
        print("wrote", out)
        return

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
    # Pristine-per-query (r14, VERDICT r13 item 4): each (scale, query)
    # measurement runs in its own COLD subprocess — the r13 battery ran
    # one warm session and its 1x rows carried a 1.5-2x accumulated
    # executor-JVM tax (fuzzy 4.4 s warm vs 3.99 s fresh; jaccard 19.1
    # vs 8.94), the effect tools/probe_knn_split.py pinned to executor
    # old-gen/GC state. Cold subprocesses also subsume the r12
    # clearCache-between-queries isolation.
    import subprocess

    result: dict = {
        "method": "toPandas wall-clock, one cold subprocess per (scale, query)",
        "per_scale": {},
    }
    for label, d in scales.items():
        if not Path(d).exists():
            print("missing fixture:", d, "— run tools/make_scale10.py")
            continue
        rows = {}
        for name in QUERIES:
            proc = subprocess.run(
                [sys.executable, __file__, "--child", label, d, name],
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
                rows[name] = {"error": (proc.stderr or proc.stdout)[-2000:]}
                print(f"{label:>4} {name}: CHILD FAILED", flush=True)
                continue
            rows[name] = json.loads(line)[name]
            print(
                f"{label:>4} {name}: {rows[name]['sec']:.2f}s "
                f"rows={rows[name].get('rows')}",
                flush=True,
            )
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
