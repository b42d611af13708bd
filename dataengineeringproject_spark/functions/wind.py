"""E4: Beaufort-style wind-strength bucketing.

Reference: `classify_wind`, a 12-branch if/elif chain over m/s speed
(group_project_dag.py:70-98; v5_group_project_dag.py:113-141), applied
per row via `.apply` — the reference's slowest path. Here it is a single
chained `F.when` Column expression: JVM-side, whole-stage-codegen'd, no
Python worker.

Boundary semantics (SURVEY.md §2.3 E4): every reference branch is
double-inclusive and the chain short-circuits, so an exact boundary
value lands in the LOWER bucket (1.5 m/s → Calm). Negative speeds fall
through every branch → null (§2.8.5). NaN needs an explicit guard:
Spark orders NaN greater than any number, so without the guard NaN
would satisfy `>= 32.6` and classify as Violent Storm.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (upper bound inclusive in m/s, label) — chain order is the semantics.
WIND_BUCKETS: list[tuple[float, str]] = [
    (1.5, "Calm"),
    (3.3, "Light Air"),
    (5.4, "Light Breeze"),
    (7.9, "Gentle Breeze"),
    (10.7, "Moderate Breeze"),
    (13.8, "Fresh Breeze"),
    (17.1, "Strong Breeze"),
    (20.7, "Near Gale"),
    (24.4, "Gale"),
    (28.4, "Strong Gale"),
    (32.6, "Storm"),
]
WIND_TOP_LABEL = "Violent Storm"


def classify_wind(col: Column | str) -> Column:
    """m/s wind speed → strength label; null for negative/NaN/null."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(F.isnan(c) | (c < 0), F.lit(None).cast("string"))
    lo = 0.0
    for hi, label in WIND_BUCKETS:
        expr = expr.when((c >= F.lit(lo)) & (c <= F.lit(hi)), F.lit(label))
        lo = hi
    # chain short-circuits, so exactly 32.6 already matched "Storm"
    return expr.when(c > F.lit(WIND_BUCKETS[-1][0]), F.lit(WIND_TOP_LABEL))


def classify_wind_sql(value_expr: str) -> str:
    """The identical bucketing as an ANSI-SQL CASE expression (for the
    DuckDB oracle). Kept next to the Column version so the two can't
    drift."""
    branches = [f"WHEN ({value_expr}) < 0 THEN NULL"]
    lo = 0.0
    for hi, label in WIND_BUCKETS:
        branches.append(
            f"WHEN ({value_expr}) >= {lo!r} AND ({value_expr}) <= {hi!r} THEN '{label}'"
        )
        lo = hi
    branches.append(f"WHEN ({value_expr}) > {WIND_BUCKETS[-1][0]!r} THEN '{WIND_TOP_LABEL}'")
    return "CASE " + " ".join(branches) + " END"
