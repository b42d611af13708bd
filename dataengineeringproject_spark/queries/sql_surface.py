"""The engine's SQL surface: the same testdata served through
`spark.sql` over registered views — a user who prefers SQL to the
DataFrame API runs the identical Catalyst plans (SURVEY.md §3: the
reference has no query language at all; this is the north-star
query-surface completeness item).

Views are prefixed `deps_` so registering them can never collide with
state the external driver keeps in its own session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineeringproject_spark.registry import register
from dataengineeringproject_spark.schemas import TESTDATA_TABLES, load_table


def register_testdata_views(
    spark: SparkSession, sf_dir: str, prefix: str = "deps_"
) -> list[str]:
    """Register every testdata table as a temp view `{prefix}{name}`
    (idempotent; replaces stale views pointing at another sf_dir)."""
    names = []
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{prefix}{t}")
        names.append(f"{prefix}{t}")
    return names


@register(
    "sql_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape, expressed ENTIRELY in SQL against registered
    views — proves the SQL surface compiles to the same pushed-down,
    broadcast-dimension plans as the DataFrame API (it is the same
    Catalyst underneath)."""
    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM deps_customer c
        JOIN deps_orders o ON o.o_custkey = c.c_custkey
        JOIN deps_lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
        """
    )
