"""Window-spec helpers.

tiny_ordered_window exists so that Spark's `WindowExec: No Partition
Defined` warning stays a SIGNAL: the warning fires on any empty
partition spec, including the deliberate rank windows over top-k /
aggregate-sized frames (<= ~50 rows) where single-partition execution
is exactly right. Pinning partitionBy(lit(0)) on those makes the
execution shape explicit (hash-partition-all-to-one of a tiny frame —
one trivial exchange), silences the benign warnings, and leaves any
remaining WindowExec warning pointing at a real unpartitioned window
over raw-scale data (the two diagnostic exact variants, which warn
honestly).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def tiny_ordered_window(*cols: Column | str) -> WindowSpec:
    """Total-order window for a frame already bounded to top-k /
    aggregate size. NEVER use over a raw-scale frame — the lit(0)
    partition key moves everything to one task by design."""
    return Window.partitionBy(F.lit(0)).orderBy(*cols)
