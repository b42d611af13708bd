"""Environment-drift canaries (VERDICT r2 item 4).

Round 2 ended with 8 broken queries because the testdata generator
changed `events.ts` from TIMESTAMP(NANOS) parquet to plain
TIMESTAMP(MICROS, isAdjustedToUTC=0), which PySpark 4.1.2 scans as
TIMESTAMP_NTZ — a type it refuses to `cast("long")`, feed to
`unix_micros`, or watermark. These tests name the contract that
`schemas.load_table` must uphold regardless of the physical layout the
testdata ships in, so the NEXT testdata/Spark drift fails one obvious
test instead of nine opaque ones.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineeringproject_spark.schemas import TESTDATA_TABLES, load_table

from conftest import SF_SMOKE


def test_events_ts_is_session_tz_timestamp(spark):
    """THE contract: load_table('events').ts is TimestampType (session
    TZ, i.e. dtype string 'timestamp'), never TIMESTAMP_NTZ and never a
    raw bigint — whatever the parquet physical type is this month."""
    events = load_table(spark, SF_SMOKE, "events")
    assert dict(events.dtypes)["ts"] == "timestamp"


def test_events_ts_supports_epoch_and_watermark_ops(spark):
    """The three operations the r2 drift broke must all plan+run:
    CAST(ts AS BIGINT), unix_micros(ts), and withWatermark('ts', ...)
    (watermark requires TimestampType; NTZ is rejected)."""
    events = load_table(spark, SF_SMOKE, "events")
    row = events.select(
        F.min(F.col("ts").cast("long")).alias("lo_s"),
        F.min(F.unix_micros("ts")).alias("lo_us"),
    ).first()
    # cast("long") is epoch SECONDS; unix_micros is epoch microseconds
    assert row.lo_s is not None and row.lo_us // 1_000_000 == row.lo_s
    # plan-time check only; no stream started
    events.withWatermark("ts", "1 day")._jdf.schema()


def test_events_ts_instant_matches_duckdb_oracle(spark):
    """Value-level pin: the normalized Spark instant equals DuckDB's
    UTC-naive reading of the same parquet (the oracle's view of truth).
    Guards against a fix that makes types work but shifts the epoch."""
    duckdb = pytest.importorskip("duckdb")
    lo_us, n = duckdb.sql(
        "SELECT epoch_us(min(ts)), count(*) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()
    events = load_table(spark, SF_SMOKE, "events")
    row = events.select(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert (row.lo, row.n) == (lo_us, n)


def test_all_tables_load_with_expected_columns(spark):
    """Every testdata table loads and keeps its TESTDATA.md column set
    (drift in table names/columns should fail here first)."""
    expected_any = {
        "region": {"r_regionkey", "r_name"},
        "nation": {"n_nationkey", "n_name"},
        "customer": {"c_custkey", "c_nationkey"},
        "supplier": {"s_suppkey", "s_nationkey"},
        "part": {"p_partkey", "p_retailprice"},
        "orders": {"o_orderkey", "o_orderdate"},
        "lineitem": {"l_orderkey", "l_quantity"},
        "events": {"event_id", "ts", "user_id", "event_type", "value"},
        "documents": {"doc_id", "text"},
        "embeddings": {"vec_id", "embedding"},
    }
    for name in TESTDATA_TABLES:
        cols = set(load_table(spark, SF_SMOKE, name).columns)
        missing = expected_any[name] - cols
        assert not missing, f"{name} lost columns: {missing}"
