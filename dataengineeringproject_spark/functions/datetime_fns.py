"""E1/E2: timestamp parsing and grain extraction.

Reference: `strptime(x, "%Y-%m-%d %H:%M:%S.%f %z").date()` per row via
`.apply` (group_project_dag.py:124; v5_group_project_dag.py:74) and
`strftime("%Y-%m")` (v5:76). Both compile to native expressions — the
reference's per-row Python `.apply` (its slow path, SURVEY.md §4) is
replaced by whole-stage-codegen'd JVM expressions.

Timezone semantics (SURVEY.md §7.3 item 3): `.date()` in the reference
takes the date in the ORIGINAL offset's wall clock. Spark's
`to_timestamp` would normalize the instant to the session TZ, shifting
rows across day buckets near midnight. We preserve wall-clock dates by
stripping the trailing offset BEFORE parsing — the string's leading 23
chars are the local wall-clock time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_formatted_date(col: Column | str) -> Column:
    """`"2006-04-01 13:00:00.000 +0200"` → DATE in the offset's own wall
    clock (reference E1). Unparseable/empty → null (feeds P7)."""
    c = F.col(col) if isinstance(col, str) else col
    local_part = F.substring(F.trim(c), 1, 23)
    return F.to_date(F.try_to_timestamp(local_part, F.lit("yyyy-MM-dd HH:mm:ss.SSS")))


def ts_to_date(col: Column | str) -> Column:
    """E1 analog for native timestamp columns (testdata `events.ts`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c)


def month_str(col: Column | str) -> Column:
    """E2: date/timestamp → `"yyyy-MM"` string (group_project_dag.py:126).

    Kept as a STRING to match the reference's runtime type — its DDLs
    declare INTEGER/DATETIME but actually store strings (SURVEY.md §2.8.6).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM")
