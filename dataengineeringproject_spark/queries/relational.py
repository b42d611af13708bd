"""Relational breadth (SURVEY.md §2.5 J1/O1-O3, §7.2.8): the full Spark
join/sort/limit/set-op surface over the TPC-H-ish testdata. The
reference has no joins — these exist for harness coverage and the
north-star engine surface.

Scale notes per query are in the docstrings; the common posture:
- dimension tables (region/nation/supplier/customer/part) are broadcast
  — no shuffle of the fact table on their account.
- fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  handles skew.
- top-k is computed with row_number over a deterministic total order,
  never a driver-side sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringproject_spark.registry import register
from dataengineeringproject_spark.schemas import load_table


# --- TPC-H Q1: pricing summary (scan + 2-key agg + 8 measures) -------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(sum(l_quantity), 2) AS sum_qty,
           ROUND(sum(l_extendedprice), 2) AS sum_base_price,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(avg(l_quantity), 6) AS avg_qty,
           ROUND(avg(l_extendedprice), 4) AS avg_price,
           ROUND(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1. Physical plan: parquet scan with the shipdate filter
    pushed down + partial hash-agg → 4-group shuffle → final agg; all
    expressions codegen'd."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --- TPC-H Q3-ish: shipping priority (3-way join + top-k) ------------------

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey, ROUND(revenue, 2) AS revenue, o_orderdate
    FROM (
      SELECT l.l_orderkey AS o_orderkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
             o.o_orderdate
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < DATE '1997-06-01'
        AND l.l_shipdate > DATE '1997-06-01'
      GROUP BY l.l_orderkey, o.o_orderdate
    )
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer is a dim → broadcast into orders;
    orders⋈lineitem shuffles on orderkey once. Top-10 uses a
    deterministic tiebreak (orderkey) so the oracle can't diverge on
    equal revenues; Spark executes orderBy+limit as a TakeOrderedAndProject
    (per-partition top-k, no global sort)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("date")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("date")
    )
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
               l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("o_orderkey"), "o_orderdate")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("o_orderkey", F.round("revenue", 2).alias("revenue"), "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --- TPC-H Q5-ish: local supplier volume (5-way join) ----------------------

@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name AS nation, ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: one fact-fact shuffle (orders⋈lineitem on
    orderkey); supplier/nation/region/customer all broadcast. Catalyst
    prunes region→nation→supplier before the fact join (filter pushdown
    through the dim chain)."""
    t = {n: load_table(spark, sf_dir, n)
         for n in ["customer", "orders", "lineitem", "supplier", "nation", "region"]}
    dims = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --- O2: top-k per group (window) ------------------------------------------

@register(
    "topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
             ) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 line items by price per supplier — one shuffle on the
    partition key; deterministic tiebreak on (orderkey, linenumber)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# --- J1: semi/anti joins ----------------------------------------------------

@register(
    "semi_anti_join",
    oracle="""
    SELECT c_custkey, c_name,
           CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                THEN 'has_orders' ELSE 'no_orders' END AS status
    FROM customer c
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT-EXISTS as left_semi/left_anti joins, unioned with a
    tag — covers both join types in one hash-verifiable result."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    has = c.join(o, c.c_custkey == o.o_custkey, "left_semi").withColumn(
        "status", F.lit("has_orders")
    )
    not_has = c.join(o, c.c_custkey == o.o_custkey, "left_anti").withColumn(
        "status", F.lit("no_orders")
    )
    return has.unionByName(not_has)


# --- O3: set ops ------------------------------------------------------------

@register(
    "set_ops",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT — distinct set semantics on both engines."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return f.intersect(op).exceptAll(urgent.distinct())


# --- grouping sets / rollup -------------------------------------------------

@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — partial aggregation feeds every grouping
    set from one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- CUBE grouping sets -----------------------------------------------------

@register(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           ROUND(sum(o_totalprice), 2) AS total_price,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id to disambiguate
    aggregate-null from data-null — all four grouping sets from one
    scan via Expand + partial agg."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.grouping_id().cast("long").alias("gid"),
    )


# --- arbitrary GROUPING SETS -------------------------------------------------

@register(
    "grouping_sets_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           ROUND(sum(o_totalprice), 2) AS total_price,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (Spark 4 DataFrame `groupingSets` API) —
    unlike rollup/cube this picks exactly the sets wanted, so the
    Expand fan-out is 3× the input here instead of CUBE's 4×: at
    100 TB, skipping the unneeded (status, priority) pair set is a 25%
    shuffle-volume cut over cube-and-filter. grouping_id disambiguates
    aggregate-null from data-null, as in cube_agg."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.grouping_id().cast("long").alias("gid"),
    )


# --- running window aggregates ----------------------------------------------

@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(sum(o_totalprice) OVER w, 2) AS running_spend,
           CAST(row_number() OVER w AS BIGINT) AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend + order sequence number — one shuffle
    on o_custkey serves both window functions (same window spec, single
    WindowExec)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


# --- O1: global sort --------------------------------------------------------

@register(
    "order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge of 25-row heads, NOT a full range-partitioned
    sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# --- TPC-H Q6: pushdown-heavy filter + global agg ---------------------------

@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate reaches the parquet scan (PushedFilters
    on shipdate/discount/quantity), then a single global agg — the
    pushdown showcase: at 100 TB this reads a fraction of row groups
    and shuffles 32 partial rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- correlated-subquery pattern: above the group average -------------------

@register(
    "parts_above_brand_avg",
    oracle="""
    SELECT p.p_partkey, p.p_brand,
           ROUND(p.p_retailprice, 2) AS retail_price,
           ROUND((SELECT avg(p2.p_retailprice) FROM part p2
                  WHERE p2.p_brand = p.p_brand), 2) AS brand_avg
    FROM part p
    WHERE p.p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                             WHERE p2.p_brand = p.p_brand)
    """,
)
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery semantics (price above own-brand
    average) decorrelated into one window aggregate — single shuffle on
    p_brand instead of a per-row subquery; the oracle keeps the
    genuinely correlated formulation, so agreement checks the
    decorrelation."""
    w = Window.partitionBy("p_brand")
    p = load_table(spark, sf_dir, "part").withColumn(
        "__avg", F.avg("p_retailprice").over(w)
    )
    return p.filter(F.col("p_retailprice") > F.col("__avg")).select(
        "p_partkey",
        "p_brand",
        F.round("p_retailprice", 2).alias("retail_price"),
        F.round("__avg", 2).alias("brand_avg"),
    )


# --- full outer join --------------------------------------------------------

@register(
    "nation_wealth_full_outer",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, count(*) AS n_rich_cust
      FROM customer WHERE c_acctbal > 9900 GROUP BY 1
    ),
    s AS (
      SELECT s_nationkey AS nk, count(*) AS n_rich_supp
      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
    )
    SELECT CAST(COALESCE(c.nk, s.nk) AS BIGINT) AS nationkey,
           CAST(COALESCE(n_rich_cust, 0) AS BIGINT) AS n_rich_cust,
           CAST(COALESCE(n_rich_supp, 0) AS BIGINT) AS n_rich_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def nation_wealth_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two sparse aggregates (nations having
    high-balance customers vs suppliers) — both null sides are
    genuinely exercised at this SF; aggregate-before-join keeps the
    outer join's shuffle at |nations|, not |customers|."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_rich_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_rich_supp"))
    )
    return c.join(s, F.col("nk_c") == F.col("nk_s"), "full_outer").select(
        F.coalesce("nk_c", "nk_s").cast("long").alias("nationkey"),
        F.coalesce("n_rich_cust", F.lit(0)).alias("n_rich_cust"),
        F.coalesce("n_rich_supp", F.lit(0)).alias("n_rich_supp"),
    )


# --- TPC-H Q14: conditional aggregation over a join --------------------------

@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: part is a broadcast dim; the month filter is pushed to
    the lineitem scan; conditional sum folds into one aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct")
        )
    )


# --- TPC-H Q18: HAVING-filtered aggregate driving a join ---------------------

@register(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           ROUND(t.total_qty, 2) AS total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) t ON t.l_orderkey = o.o_orderkey
    ORDER BY total_qty DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join — the HAVING aggregate
    shrinks lineitem to qualifying orderkeys BEFORE touching orders
    (at scale: shuffle once on orderkey, broadcast the small survivor
    set into orders)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(F.broadcast(big), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


# --- TPC-H Q4-ish: priority count with EXISTS semi-join ----------------------

@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join), adapted to the testdata
    schema: the commit/receipt-date lateness predicate becomes "some
    line shipped more than 60 days after the order date". The date
    filter prunes orders BEFORE the semi join; the semi join shuffles
    both sides on orderkey but carries no lineitem payload columns."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --- TPC-H Q7-ish: volume shipping between two nations -----------------------

@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year between two
    nations. supplier/customer/nation are dims → broadcast both
    nation-filtered sides; the only fact-fact shuffle is
    lineitem⋈orders on orderkey. The nation filters land BEFORE the
    fact joins, shrinking the dim broadcasts to the two nations."""
    nations = ["NATION_1", "NATION_2"]
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --- TPC-H Q2-ish: argmin join-back (keep ALL ties) --------------------------

@register(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH m AS (
      SELECT s_nationkey, min(s_acctbal) AS min_bal
      FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_name AS nation, s.s_suppkey, s.s_name,
           ROUND(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    JOIN m ON s.s_nationkey = m.s_nationkey AND s.s_acctbal = m.min_bal
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's essence (correlated MIN subquery → decorrelated
    aggregate + join-back, keeping ALL tied rows — unlike row_number
    top-1 which would break ties arbitrarily). The per-nation min is
    tiny → broadcast back into supplier; nation is a dim → broadcast.
    Equality on the min is exact: both sides carry the same stored
    double, no recomputation."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    m = s.groupBy(F.col("s_nationkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        s.join(
            F.broadcast(m),
            (F.col("s_nationkey") == F.col("mk"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )
