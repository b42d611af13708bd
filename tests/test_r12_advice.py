"""Round-12 regression pins for the ADVICE r11 items.

1. `ensure_min_parallelism` is a no-op pass-through on streaming
   DataFrames (df.rdd raises AnalysisException there, so any streaming
   consumer of the MinHash/vector operator families would fail at plan
   time without the guard).
2. `assign_nearest`'s argmin ranks a NaN cosine FIRST — the pre-r11
   window (`ccos DESC`, Spark sorts NaN above +inf) and the unchanged
   DuckDB row_number oracles both do; the naive min(struct) with
   __neg = -NaN = NaN ranked it LAST. NULL (zero-norm) still loses.
3. `knn_classifier_eval`'s zip_with integer dot coalesces NULL pad
   products to 0, so a ragged embedding contributes its partial dot
   over shared indices (the old dimension-keyed join's and the DuckDB
   oracle's semantics) instead of silently dropping the pair.
4. `kmeans_cluster_stats` projects the interpreted-HOF ccos in its own
   select stage; __neg derives from the materialized column, so the
   dominant N×k cosine cost is evaluated once, not twice.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from _harness import compare
from dataengineeringproject_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


def test_min_parallelism_streaming_passthrough(spark):
    """ADVICE r11 item 1: a streaming frame must come back unchanged
    (identity, not a repartitioned copy) — df.rdd would raise."""
    sdf = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    assert sdf.isStreaming
    out = S.ensure_min_parallelism(sdf, "value")
    assert out is sdf


def _assign(spark, cents_rows):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, v array<double>"
    )
    cents = spark.createDataFrame(
        cents_rows, "cid bigint, cv array<double>"
    )
    rows = S.assign_nearest(vecs, cents, "vec_id").collect()
    assert len(rows) == 1
    return rows[0].cid


def test_assign_nearest_nan_cosine_ranks_first(spark):
    """ADVICE r11 item 3: NaN cosine must WIN against any real cosine
    (window/oracle `ccos DESC` semantics: NaN sorts above +inf)."""
    nan = float("nan")
    # cid 9 has perfect cosine 1.0; cid 5 yields a NaN cosine.
    assert _assign(spark, [(5, [nan, 0.0]), (9, [1.0, 0.0])]) == 5
    # multiple NaN centroids tie-break on min cid.
    assert _assign(spark, [(7, [nan, 0.0]), (4, [nan, 1.0]), (9, [1.0, 0.0])]) == 4


def test_assign_nearest_null_cosine_still_loses(spark):
    """Zero-norm (NULL via try_divide) keeps ranking LAST — the NaN
    sentinel must not disturb the NULL sentinel."""
    assert _assign(spark, [(1, [0.0, 0.0]), (2, [0.5, 0.5])]) == 2
    # all-NULL degenerates to min cid (both engines).
    assert _assign(spark, [(3, [0.0, 0.0]), (2, [0.0, 0.0])]) == 2


def test_knn_ragged_embedding_partial_dot_matches_oracle(spark, tmp_path):
    """ADVICE r11 item 2: on a fixture containing a RAGGED embedding
    (len 3 among len-4 vectors), the Spark query must still hash-match
    its DuckDB oracle — the oracle's dimension-join dot sums shared
    indices, so the ragged vector participates with a partial dot
    rather than dropping out of the vote via a NULL-poisoned sum."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, embs, labels = [], [], []
    for i in range(60):
        dim = 3 if i == 0 else 4
        ids.append(i)
        embs.append([float((i * 7 + d * 3) % 11 - 5) for d in range(dim)])
        labels.append(i % 4)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    ok, msg = compare(spark, "knn_classifier_eval", str(tmp_path))
    assert ok, msg


def test_kmeans_stats_ccos_projected_once(spark):
    """ADVICE r11 item 4: __neg must derive from the MATERIALIZED ccos
    attribute, not re-inline the N×k interpreted-HOF cosine — every
    optimized-plan line defining __neg is free of try_divide (the
    cosine marker), proving CollapseProject kept the two-select shape."""
    from dataengineeringproject_spark.registry import queries

    df = queries()["kmeans_cluster_stats"](spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    neg_def_lines = [l for l in plan.split("\n") if "AS __neg" in l]
    assert neg_def_lines, "argmin __neg projection missing from plan"
    for line in neg_def_lines:
        assert "try_divide" not in line, (
            "ccos re-inlined into __neg (double evaluation):\n" + line
        )


def test_knn_lsh_cap_formula_cross_engine(spark):
    """VERDICT r11 item 3: the log-scaled per-bucket candidate cap must
    evaluate to the SAME integer on Spark, DuckDB, and the Python twin
    (_knn_lsh_cap) for the measured fixture sizes and the boundary
    cases (n <= capbase -> factor 1; exact power-of-two ratios, where
    log2 is IEEE-exact on both engines)."""
    import duckdb
    import pyspark.sql.functions as F

    from dataengineeringproject_spark.queries.llm_vectors import (
        _KNN_BUCKCAP,
        _KNN_CAPBASE,
        _knn_lsh_cap,
    )

    cases = [1, 100, 1405, _KNN_CAPBASE, 2 * _KNN_CAPBASE,
             4 * _KNN_CAPBASE, 13997, 140161, 10**9]
    expected = {1: 128, 1405: 128, _KNN_CAPBASE: 128,
                2 * _KNN_CAPBASE: 128, 4 * _KNN_CAPBASE: 256,
                13997: 384, 140161: 896}
    con = duckdb.connect()
    for n in cases:
        py = _knn_lsh_cap(n)
        duck = con.execute(
            f"SELECT {_KNN_BUCKCAP} * greatest(1, ceil(log2("
            f"greatest({n}, 1) / {_KNN_CAPBASE}e0)))"
        ).fetchone()[0]
        sp = (
            spark.range(1)
            .select(
                (
                    F.lit(_KNN_BUCKCAP)
                    * F.greatest(
                        F.lit(1).cast("long"),
                        F.ceil(
                            F.log2(
                                F.greatest(F.lit(n), F.lit(1))
                                / F.lit(float(_KNN_CAPBASE))
                            )
                        ),
                    )
                ).alias("cap")
            )
            .collect()[0].cap
        )
        assert py == int(duck) == int(sp), (n, py, duck, sp)
        if n in expected:
            assert py == expected[n], (n, py)


def test_nanvl_sentinel_value(spark):
    """The sentinel expression itself: -NaN→-inf (wins), NULL→+inf
    (loses), real cosine passes through negated."""
    row = spark.range(1).select(
        F.coalesce(
            F.nanvl(-F.lit(float("nan")), F.lit(float("-inf"))),
            F.lit(float("inf")),
        ).alias("nan_case"),
        F.coalesce(
            F.nanvl(-F.lit(None).cast("double"), F.lit(float("-inf"))),
            F.lit(float("inf")),
        ).alias("null_case"),
        F.coalesce(
            F.nanvl(-F.lit(0.25), F.lit(float("-inf"))),
            F.lit(float("inf")),
        ).alias("real_case"),
    ).collect()[0]
    assert row.nan_case == float("-inf")
    assert row.null_case == float("inf")
    assert row.real_case == -0.25
    assert not math.isnan(row.nan_case)
