"""Python UDTF extension point (completes the Python-surface family:
scalar pandas_udf, mapInPandas, applyInPandas, applyInPandasWithState,
transformWithState, and — here — user-defined TABLE functions).

UDTFs are row-at-a-time Python (they plan as BatchEvalPythonUDTF, the
same serialization boundary as a plain Python UDF), so they are a COLD
PATH by engine policy (DEPLOY.md: no row-at-a-time Python in hot
paths): use them for low-volume lateral expansions where the
row-multiplying semantics buy real expressiveness — config explosion,
API-response unpacking, per-row rule engines — and reach for
explode()/mapInPandas when volume is high.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, val_str: string")
class ExplodeJsonObject:
    """Lateral-view a one-level JSON object column into (key, value)
    rows — `SELECT ... FROM t, explode_json(t.props)` semantics for
    payloads whose keys are NOT known at plan time (when they are,
    prefer from_json + explode(map) which stays JVM-side)."""

    def eval(self, doc: str):  # noqa: D102 — contract defined by Spark
        if not doc:
            return
        try:
            obj = json.loads(doc)
        except (ValueError, TypeError):
            return
        if isinstance(obj, dict):
            for k, v in sorted(obj.items()):
                yield str(k), json.dumps(v, sort_keys=True)


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("explode_json", ExplodeJsonObject)
