"""TPC-H breadth, part 2 (SURVEY.md §7.2.8 harness coverage): the
remaining classic query shapes — Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q19/
Q20/Q21/Q22 — adapted to the testdata star schema (TESTDATA.md), which
has no `partsupp` table and no commit/receipt dates; where the original
uses those, the adaptation preserves the SHAPE (the join graph, the
aggregation pattern, the subquery class) with the columns available.

The reference project has no joins at all (SURVEY.md §2.5 J1); these
exist for engine-surface completeness and exercise every subquery
decorrelation class: scalar-aggregate broadcast (Q11/Q15/Q22),
per-group aggregate join-back (Q17), conditional aggregation (Q8/Q12),
left-outer + double aggregation (Q13), multi-EXISTS self-join collapse
(Q21), and disjunctive predicate pushdown (Q19).

Scale posture (100 TB): dims (part 0.2%, supplier 0.01%, customer 1.5%
of lineitem rows) are broadcast; the only shuffles are fact-fact
orders⋈lineitem on orderkey and the per-key aggregates. Global scalars
(Q11 total, Q15 max, Q22 avg) are 1-row DataFrames cross-joined as
broadcasts — never driver collects, never single-partition windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringproject_spark.registry import register
from dataengineeringproject_spark.schemas import load_table


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q8: market share (conditional aggregation over a 6-way join) ----------

@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      WHERE p.p_type = 'PROMO'
        AND r.r_name = 'ASIA'
        AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_2's share of PROMO-part revenue sold into ASIA,
    per year. All five dims broadcast; the one shuffle is
    lineitem⋈orders on orderkey, then a 2-group aggregate. The share is
    a conditional sum over the same rows — one pass, no self-join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date")
        )
    )
    c = load_table(spark, sf_dir, "customer")
    nc = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = c.join(
        F.broadcast(nc.join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)),
        c.c_nationkey == nc.n_nationkey,
    ).select("c_custkey")
    o_asia = o.join(F.broadcast(cust_asia), o.o_custkey == cust_asia.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sn_key"))
        .join(o_asia, l.l_orderkey == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(F.lit(0.0)))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


# --- Q9: product-type profit (multi-dim join, 2-key agg) -------------------

@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.1 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape. The original prices cost from partsupp
    (ps_supplycost, absent here); the adaptation takes cost = 10% of
    p_retailprice per unit, preserving the join graph and the
    (nation, year) profit rollup. p_name LIKE filter prunes part before
    broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    amount = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


# --- Q11: important stock (HAVING vs global-scalar broadcast) --------------

@register(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, ROUND(value, 2) AS value
    FROM v, (SELECT sum(value) AS total FROM v)
    WHERE value > 0.001 * total
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value → lineitem shipped value): parts
    whose NATION_3-supplied value exceeds 0.1% of that nation's total.
    The global total is a 1-row aggregate cross-joined back as a
    broadcast — the scalar-subquery decorrelation; no single-partition
    window, no driver collect."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        l.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
               l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = v.agg(F.sum("value").alias("total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.001 * F.col("total"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


# --- Q12: shipping "modes" — conditional counts after a fact-fact join -----

@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_shipmode → l_linestatus; the receipt-date
    window → a shipdate year, since this schema has no receipt/commit
    dates). One orderkey shuffle, then conditional counts — the
    CASE-in-SUM pattern stays a single aggregation pass."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --- Q13: customer order-count distribution (outer join + double agg) ------

@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed k orders, including k=0 —
    the left-outer-join-then-count idiom (the comment-pattern filter of
    the original becomes a priority filter). Orders is pre-aggregated
    per custkey BEFORE the outer join, so the join input is one row per
    customer instead of one per order — at 100 TB this is the
    difference between joining 1.5B rows and 150M."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy(F.col("o_custkey"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


# --- Q15: top supplier (argmax vs broadcast global max, ties kept) ---------

@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The revenue
    view feeds BOTH the global max and the equality probe; without an
    explicit cache Spark would scan+aggregate lineitem twice (the two
    consumers are different aggregates, so ReuseExchange doesn't apply)
    — caching the per-supplier rollup (|suppliers| rows, tiny relative
    to the fact) makes the second consumer an InMemoryTableScan.
    Revenue is rounded BEFORE the max/equality so tie semantics are
    well-defined across engines. Max arrives as a broadcast 1-row cross
    join, ties kept — the view-based argmax decorrelation."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    ).cache()
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16: supplier counts per part bucket (distinct agg + NOT IN) ----------

@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp → the lineitem part-supplier bridge):
    distinct supplier count per (brand, type, size) with NOT-IN
    exclusions. The exclusions are plain filters on the broadcast side;
    COUNT(DISTINCT) expands to a two-level aggregate (dedup on the
    group key + suppkey, then count) — Catalyst does this rewrite."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --- Q17: small-quantity revenue (per-group avg join-back) -----------------

@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l2.l_partkey, 0.2 * avg(l2.l_quantity) AS qty_thresh
      FROM lineitem l2
      JOIN part p2 ON p2.p_partkey = l2.l_partkey
      WHERE p2.p_brand = 'Brand#23'
      GROUP BY l2.l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < t.qty_thresh
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost if small-quantity orders of one brand's
    parts vanished. The correlated AVG subquery decorrelates into a
    per-part aggregate joined back; the brand filter is applied BEFORE
    the aggregate so only that brand's lineitems are averaged (~1/25 of
    parts), making the join-back side broadcastable. l_quantity is
    integer-valued, so sums/avgs are exact doubles and the `<`
    comparison cannot diverge between engines."""
    p23 = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lb = l.join(F.broadcast(p23), l.l_partkey == p23.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = lb.groupBy(F.col("l_partkey").alias("tk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        lb.join(F.broadcast(thresh), lb.l_partkey == F.col("tk"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --- Q19: disjunctive predicate pushdown ----------------------------------

@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: an OR of three (brand, size, quantity) conjunctions
    across the join. Catalyst extracts the common single-side
    implications (brand∈{...} onto part, quantity∈[1,30] onto lineitem)
    and pushes them below the join as scan filters — assert via plan
    snapshot; the residual disjunction evaluates post-join in codegen."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


# --- Q20: qualified suppliers (aggregate-threshold semi-join chain) --------

@register(
    "q20_promo_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_1'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= DATE '1997-01-01'
          AND l.l_shipdate < DATE '1998-01-01'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 300
      )
    """,
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp availability → shipped quantity):
    NATION_1 suppliers who moved >300 units of PROMO parts in 1997.
    The IN-subquery is an aggregate-then-left-semi-join; part and the
    qualifying-supplier set are both broadcast. Quantity sums are
    integer-exact, so the HAVING threshold is engine-stable."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    qual = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ----------

@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l.l_orderkey,
             count(DISTINCT l.l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
                                 THEN l.l_suppkey END) AS n_late,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
                      THEN l.l_suppkey END) AS late_supp
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_order po
    JOIN supplier s ON s.s_suppkey = po.late_supp
    WHERE po.n_supp >= 2 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finished order (late = shipped >30 days after order
    date, standing in for receipt>commit). The original's
    EXISTS/NOT-EXISTS pair of correlated self-joins collapses into ONE
    per-order aggregate — n_supp≥2 encodes the EXISTS(other supplier),
    n_late=1 encodes the NOT EXISTS(other late supplier) + self-late —
    turning two extra lineitem shuffles into none beyond the groupBy.

    Physical note: written as a TWO-LEVEL aggregate — first collapse to
    (orderkey, suppkey, was_late), then count per orderkey — instead of
    two COUNT(DISTINCT)s in one pass, because multiple distinct
    aggregates plan as an Expand (3 projected copies of every row into
    the shuffle); the two-level form touches each lineitem row once. At
    scale the orders⋈lineitem SMJ leaves the data hash-partitioned on
    orderkey, which satisfies ClusteredDistribution for BOTH grouping
    keys ((orderkey, suppkey) is a superset of the partitioning key) —
    so both aggregates run exchange-free on the join output. (At test
    SF the orders side broadcasts, so the first aggregate pays one
    shuffle of the already-collapsed rows — still no Expand.)"""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    per_supp = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("was_late"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("was_late").alias("n_late"),
            F.max(F.when(F.col("was_late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_order.join(F.broadcast(s), per_order.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --- Q22: idle rich customers (scalar-avg + anti join) ---------------------

@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH thresh AS (
      SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           ROUND(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c, thresh
    WHERE c.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone country-code → c_nationkey): customers
    richer than the positive-balance average who never placed an URGENT
    order (every customer in this testdata has SOME order, so the bare
    original predicate would be vacuous). Global avg broadcast via
    1-row cross join; NOT EXISTS is a left-anti join against the
    DISTINCT qualifying custkeys (pre-deduped so the anti probe side is
    one row per customer, not per order)."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    o_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_cust, c.c_custkey == o_cust.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
