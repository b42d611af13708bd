"""E3: unit conversions (group_project_dag.py:72-73; v5:115-116)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def kmh_to_ms(col: Column | str) -> Column:
    """km/h → m/s, exactly the reference's `ws * 1000 / 3600`."""
    c = F.col(col) if isinstance(col, str) else col
    return c * 1000 / 3600
