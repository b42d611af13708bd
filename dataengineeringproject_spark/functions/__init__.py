"""Scalar expression layer — every reference row-function compiled to
native Spark Column expressions (zero Python UDFs: SURVEY.md §2.7)."""

from dataengineeringproject_spark.functions.datetime_fns import (
    month_str,
    parse_formatted_date,
    ts_to_date,
)
from dataengineeringproject_spark.functions.units import kmh_to_ms
from dataengineeringproject_spark.functions.wind import classify_wind

__all__ = [
    "parse_formatted_date",
    "ts_to_date",
    "month_str",
    "kmh_to_ms",
    "classify_wind",
]
