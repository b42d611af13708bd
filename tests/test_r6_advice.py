"""Round-6 regression pins for the four ADVICE r5 findings.

1. trend_theil_sen lower-median selection on an EVEN pairwise-slope
   count (the shipped corpus always yields odd counts, so the r5 bug —
   double division making rn == x.5 never match — was invisible).
2. cosine NaN/NULL ordering parity once a zero-norm vector actually
   appears in the data (oracle side now guards with
   nullif(list_cosine_similarity(..), 'NaN'::DOUBLE)).
3. streaming monitor state recovery under NEGATIVE event values
   (max(sv) is only monotone for non-negative values; recovery now
   selects sv from the max-count row per key).
4. char-split granularity parity: both engines verified CODE-POINT
   grained (combining marks separate, surrogate-pair emoji whole) —
   the advisor's grapheme-cluster concern does not reproduce on this
   DuckDB build, pinned here so a future engine bump that changes
   granularity fails loudly.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests._harness import normalize

SF_SMOKE = "/root/testdata/sf0.001"


def _oracle_con(d: str, *tables: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )
    return con


def test_theil_sen_even_pair_count_matches_oracle(spark, tmp_path):
    """4 days of one event_type → C(4,2) = 6 pairwise slopes (EVEN):
    the lower median is rank 3 of 6. Under the r5 bug (double division,
    rn == 3.5 never true) the type vanished from the result entirely;
    the fix (integer `div`) must agree with the DuckDB oracle's
    (n + 1) // 2 row exactly."""
    from dataengineeringproject_spark import registry

    d = str(tmp_path / "sfts")
    rows = [
        # (event_id, ts, user_id, event_type, value, props) — values
        # chosen so the 6 slopes are all distinct and the median is
        # not also the min/max (selection actually discriminates).
        (1, "2024-01-01 00:00:00", 1, "a", 10.0, None),
        (2, "2024-01-02 00:00:00", 1, "a", 13.0, None),
        (3, "2024-01-04 00:00:00", 1, "a", 11.0, None),
        (4, "2024-01-08 00:00:00", 1, "a", 30.0, None),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
        d + "/events.parquet"
    )
    spdf = registry.queries()["trend_theil_sen"](spark, d).toPandas()
    con = _oracle_con(d, "events")
    ddf = con.execute(registry.oracle_sql()["trend_theil_sen"]).df()
    assert len(spdf) == 1, "even pair count must NOT drop the type"
    assert int(spdf.iloc[0]["n_pairs"]) == 6
    assert normalize(spdf) == normalize(ddf)


def test_cosine_topk_zero_norm_vector_parity(spark, tmp_path):
    """Zero out one QUERY vector (vec_id 3) and one corpus vector
    (vec_id 500): every cosine involving them is NULL in Spark
    (try_divide) and NaN in raw DuckDB. With the oracle-side
    nullif(.., 'NaN') guard both engines rank them LAST (desc = nulls
    last in both), so query 3's top-5 degrades to the 5 smallest
    neighbor_ids with NULL cosine in BOTH engines — previously DuckDB
    ranked NaN FIRST and the hash diverged."""
    from dataengineeringproject_spark import registry
    from dataengineeringproject_spark.schemas import load_table

    d = str(tmp_path / "sfzero")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    zeroed = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id").isin(3, 500),
            F.transform("embedding", lambda _: F.lit(0.0).cast("float")),
        ).otherwise(F.col("embedding")),
    )
    zeroed.coalesce(1).write.parquet(d + "/embeddings.parquet")
    spdf = registry.queries()["cosine_topk"](spark, d).toPandas()
    con = _oracle_con(d, "embeddings")
    ddf = con.execute(registry.oracle_sql()["cosine_topk"]).df()
    assert len(spdf) == len(ddf)
    assert normalize(spdf) == normalize(ddf)
    q3 = spdf[spdf["query_id"] == 3].sort_values("rank")
    assert q3["cosine"].isna().all(), "zero query → all-NULL cosines"
    assert list(q3["neighbor_id"]) == sorted(q3["neighbor_id"]), (
        "NULL ties break by neighbor_id asc"
    )


def test_streaming_recovery_negative_values(spark):
    """_converged_daily_xu must read sv from the max-COUNT emission,
    not max(sv): with a negative late value the final running sum is
    LOWER than the mid-stream one, so max(sv) reconstructs a state
    that never converged (ADVICE r5). Simulated update log: day 1 of
    type 'a' emits (sv=5.0, n=1) then (sv=3.0, n=2) after a -2.0
    event arrives. Final mean = 1.5 → xu = 1_500_000."""
    from dataengineeringproject_spark.queries.streaming_q import (
        _converged_daily_xu,
    )

    log = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "2024-01-02 00:00:00", "a", 5.0, 1),
            ("2024-01-01 00:00:00", "2024-01-02 00:00:00", "a", 3.0, 2),
        ],
        "ws string, we string, event_type string, sv double, n long",
    ).select(
        F.struct(
            F.col("ws").cast("timestamp").alias("start"),
            F.col("we").cast("timestamp").alias("end"),
        ).alias("w"),
        "event_type",
        "sv",
        "n",
    )
    name = "neg_recovery_log"
    log.createOrReplaceTempView(name)
    try:
        out = _converged_daily_xu(spark, name).collect()
    finally:
        spark.catalog.dropTempView(name)
    assert len(out) == 1
    assert out[0]["xu"] == 1_500_000  # 3.0 / 2 * 1e6, NOT 5.0-based


@pytest.mark.parametrize(
    "s",
    [
        "éx\U0001f600z",  # decomposed e+combining acute, emoji
        "a‍\U0001f469‍\U0001f467b",  # ZWJ sequence members
    ],
)
def test_char_split_codepoint_parity(spark, s):
    """Spark F.split(text, '') and DuckDB split(text, '') both split at
    CODE POINT granularity — combining marks come apart, surrogate-pair
    emoji stay whole, ZWJ joiners are their own element. Verified
    identical on this build (the char_entropy_quality contract); if a
    DuckDB upgrade moves to grapheme clusters this fails loudly."""
    sp = (
        spark.createDataFrame([(s,)], ["t"])
        .select(F.split("t", "").alias("c"))
        .first()
        .c
    )
    dk = duckdb.execute("select split(?, '')", [s]).fetchone()[0]
    assert sp == dk
