"""Flagship query (SURVEY.md §7.1): the reference's daily-aggregate
pattern (A1 grouped means + A3 deterministic mode) on the testdata
`events` table — `ts` plays `Formatted Date`, `value` the measure,
`event_type` the categorical.

Physical shape: one scan of events (pruned to ts/value/event_type),
partial+final hash-agg for the means, count+window idiom for the mode,
then a broadcast-eligible join of two day-keyed aggregates (both tiny
relative to input — at 100 TB of events there are still only ~365·years
day rows). `orderBy(day)` range-partitions only the final output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
from dataengineeringproject_spark.operators.aggregates import agg_mode, grouped_means
from dataengineeringproject_spark.schemas import load_table


def daily_events_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day avg(value) + deterministic mode(event_type), ordered by day."""
    events = load_table(spark, sf_dir, "events").select(
        ts_to_date("ts").alias("day"), "value", "event_type"
    )
    means = grouped_means(events, ["day"], ["value"], prefix="avg_")
    mode = agg_mode(events, ["day"], "event_type", on_tie="min", alias="mode_event_type")
    return (
        means.join(mode, "day", "left")
        .select(
            # date-grain keys travel as ISO strings in driver-facing
            # outputs: DuckDB's pandas bridge turns DATE into midnight
            # datetimes, which would sabotage the value hash.
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("avg_value", 6).alias("avg_value"),
            "mode_event_type",
        )
        .orderBy("day")
    )
