"""The custom Python data source (sources/pyds.py) exposed through the
driver contract. Because every generated cell is a pure md5 function of
(seed, partition, row, field), DuckDB can regenerate the IDENTICAL
dataset from `generate_series` + md5 — so a from-scratch custom
connector gets a full value-hash differential check, not a rows-only
exemption: two independent implementations of the generator (Python
iterator on executors vs set-based SQL) must agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringproject_spark.registry import register
from dataengineeringproject_spark.session import ensure_package_on_workers
from dataengineeringproject_spark.sources import pyds

_PARTS, _ROWS, _SEED, _USERS = 3, 200, "drv1", 100
_BASE_US = 1_704_067_200_000_000
_SPAN_US = 30 * 86_400_000_000


def _h_sql(field: str) -> str:
    """DuckDB twin of pyds._h: 60-bit int from md5 of the cell coords."""
    key = f"'{_SEED}|' || p || '|' || i || '|{field}'"
    return f"CAST(concat('0x', substr(md5({key}), 1, 15)) AS BIGINT)"


_TYPES_SQL = "['click', 'error', 'purchase', 'signup', 'view']"


@register(
    "synth_source_events",
    oracle=f"""
    WITH parts AS (SELECT unnest(generate_series(0, {_PARTS - 1})) AS p),
    coords AS (
      SELECT p, unnest(generate_series(0, {_ROWS - 1})) AS i FROM parts
    )
    SELECT CAST(p * {_ROWS} + i AS BIGINT) AS event_id,
           CAST({_BASE_US} + {_h_sql("ts")} % {_SPAN_US} AS BIGINT) AS ts_us,
           CAST({_h_sql("user")} % {_USERS} AS BIGINT) AS user_id,
           {_TYPES_SQL}[{_h_sql("type")} % 5 + 1] AS event_type,
           ({_h_sql("value")} % 1000000) / 1000.0 AS value
    FROM coords
    """,
)
def synth_source_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the `synth_events` custom source ({_PARTS} planned input
    partitions × {_ROWS} rows, generated on executors with no driver
    involvement and no input files at all — `sf_dir` is unused by
    design). The oracle REGENERATES the dataset in pure SQL from the
    same (seed, partition, row) → md5 definition, making this a
    differential test of the connector itself."""
    # the DataSource class pickles by reference — workers must be able
    # to import the package (the external driver's session has no
    # PYTHONPATH guarantees)
    ensure_package_on_workers(spark)
    pyds.register(spark)
    return (
        spark.read.format("synth_events")
        .option("numPartitions", _PARTS)
        .option("rowsPerPartition", _ROWS)
        .option("seed", _SEED)
        .option("nUsers", _USERS)
        .load()
        .select("event_id", "ts_us", "user_id", "event_type", "value")
    )
