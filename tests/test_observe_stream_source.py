"""Observe-based one-pass quality metrics, and the streaming face of
the custom Python data source."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dataengineeringproject_spark.operators import validation as V
from dataengineeringproject_spark.schemas import load_table
from dataengineeringproject_spark.session import ensure_package_on_workers
from dataengineeringproject_spark.sources import pyds

from conftest import SF_SMOKE


def test_observe_quality_is_one_pass_and_correct(spark):
    """Metrics accumulate on the side of the caller's own action (one
    scan total) and match independently computed values."""
    ev = load_table(spark, SF_SMOKE, "events")
    observed, obs = V.observe_quality(
        ev,
        "gate",
        {
            "n_rows": F.count(F.lit(1)),
            "value_violations": V.violations(F.col("value").between(0, 500)),
            "null_props": F.sum(F.col("props").isNull().cast("long")),
            "max_value": F.max("value"),
        },
    )
    n = observed.count()  # the caller's action; no separate metrics job
    got = obs.get
    expected = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~F.coalesce(F.col("value").between(0, 500), F.lit(False))).cast("long")),
        F.sum(F.col("props").isNull().cast("long")),
        F.max("value"),
    ).first()
    assert got["n_rows"] == n == expected[0]
    assert got["value_violations"] == expected[1]
    assert got["null_props"] == expected[2]
    assert got["max_value"] == expected[3]


def test_synth_stream_replays_batch_dataset(spark, tmp_path):
    """The streaming reader's micro-batches accumulate to the EXACT
    batch dataset for the same options (replayable-source property):
    same row count, same per-column checksums."""
    ensure_package_on_workers(spark)
    pyds.register(spark)
    opts = {"numPartitions": 2, "rowsPerPartition": 150, "seed": "st1"}
    batch = spark.read.format("synth_events").options(**opts).load()
    want = batch.agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum("ts_us"), F.sum("user_id")
    ).first()

    stream = spark.readStream.format("synth_events").options(**opts).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("synth_stream_t").count() >= want[0]:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table("synth_stream_t").agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum("ts_us"), F.sum("user_id")
    ).first()
    assert tuple(got) == tuple(want)
    # and the stream ran as multiple micro-batches (one per offset step)
    assert spark.table("synth_stream_t").count() == 300
