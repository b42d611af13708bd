"""Composable DataFrame -> DataFrame operators (SURVEY.md §2)."""

from dataengineeringproject_spark.operators.aggregates import (
    agg_mode,
    grouped_means,
)
from dataengineeringproject_spark.operators.cleaning import (
    clamp_to_null,
    dedup_keep_first,
    drop_unparseable,
    fill_with_median,
    rename_columns,
)
from dataengineeringproject_spark.operators.validation import (
    ValidationError,
    expect,
    expect_no_nulls,
    expect_in_range,
)

__all__ = [
    "agg_mode",
    "grouped_means",
    "clamp_to_null",
    "dedup_keep_first",
    "drop_unparseable",
    "fill_with_median",
    "rename_columns",
    "ValidationError",
    "expect",
    "expect_no_nulls",
    "expect_in_range",
]
