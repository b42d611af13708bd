"""Validation layer: A6/A7/C2 (SURVEY.md §2.4/§2.6).

The reference's validate task raises ValueError before load
(v5_group_project_dag.py:243-267). Engine form: `expect(df, cond, msg)`
— a barrier action that scans for ONE violating row (`limit(1)`), so
the check is a short-circuiting filter, not a full count. At 100 TB the
predicate pushes into the parquet scan and the job stops at the first
violating row-group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ValidationError(ValueError):
    """Raised by `expect` — ValueError subclass to match the reference's
    raise type (v5_group_project_dag.py:245)."""


def expect(df: DataFrame, condition: Column, msg: str) -> DataFrame:
    """Fail-stop gate: raise unless `condition` holds for EVERY row.
    Returns the input df unchanged so gates compose in pipelines.
    Violating rows where the condition is null count as violations.
    """
    bad = df.filter(~F.coalesce(condition, F.lit(False))).limit(1)
    if bad.count() > 0:
        raise ValidationError(msg)
    return df


def expect_no_nulls(df: DataFrame, cols: Sequence[str], msg: str | None = None) -> DataFrame:
    """A6: `isnull().any().any()` gate (v5_group_project_dag.py:243-249)."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    return expect(df, cond, msg or f"Data validation failed: null values in {list(cols)}")


def expect_in_range(
    df: DataFrame, col: str, lo: float, hi: float, msg: str | None = None
) -> DataFrame:
    """A7: `series.between(lo, hi).all()` gate (v5_group_project_dag.py:253-267).
    Nulls pass (pandas `between` treats NaN as False but the reference
    checks ranges only after its null gate; we keep the gates orthogonal
    — nulls are `expect_no_nulls`' job)."""
    cond = F.col(col).isNull() | F.col(col).between(lo, hi)
    return expect(df, cond, msg or f"Data validation failed: {col} outside [{lo}, {hi}]")
