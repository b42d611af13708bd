"""Temporal operators as driver queries: sessionization, as-of join,
pivot. The as-of oracle uses DuckDB's native ASOF JOIN — a genuinely
independent algorithm agreeing with our union-tag window composition.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringproject_spark.operators.relational import (
    asof_join,
    pivot_counts,
    sessionize,
)
from dataengineeringproject_spark.registry import register, register_prestage
from dataengineeringproject_spark.schemas import load_table, local_df

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "sessionization",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    s AS (
      SELECT user_id,
             sum(CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM o
    )
    SELECT user_id,
           CAST(max(session_seq) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) per user: lag → flag → running sum,
    one shuffle on user_id; microsecond-exact gap arithmetic."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30, order_tiebreak="event_id")
    return s.groupBy("user_id").agg(
        F.max("session_seq").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "asof_join_purchase_click",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id,
           p.user_id,
           c.value AS last_click_value,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS micros_since_click
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent click at or
    before it. Our union-tag + last_value window composition vs DuckDB's
    native ASOF JOIN — two independent algorithms must agree."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_ts", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("click_value").alias("last_click_value"),
        (F.unix_micros("ts") - F.unix_micros("click_ts"))
        .cast("long")
        .alias("micros_since_click"),
    )


@register(
    "pivot_daily_event_counts",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           {", ".join(
               f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}"
               for t in _EVENT_TYPES
           )}
    FROM events GROUP BY 1
    """,
)
def pivot_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no driver-side distinct scan);
    compiles to one hash aggregate with conditional counts."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "event_type"
    )
    out = pivot_counts(ev, "day", "event_type", _EVENT_TYPES)
    return out.select(
        "day", *[F.col(t).cast("long").alias(t) for t in _EVENT_TYPES]
    )


@register(
    "salted_skew_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(sum(value), 2) AS total_value,
           ROUND(avg(value), 6) AS avg_value,
           ROUND(max(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (salting) on the low-cardinality
    event_type key — the worst-case shape for reducer skew: the salted
    partial caps any reduce task at ~1/16 of the hottest key before the
    tiny final combine. Result is bit-identical to the direct groupBy
    (decomposable aggregates), which is exactly what the oracle checks.
    """
    from dataengineeringproject_spark.operators.aggregates import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": ("count", "*"),
            "total_value": ("sum", "value"),
            "avg_value": ("avg", "value"),
            "max_value": ("max", "value"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("total_value", 2).alias("total_value"),
        F.round("avg_value", 6).alias("avg_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@register(
    "zscore_per_group",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - avg(value) OVER w) / stddev_samp(value) OVER w, 6)
             AS zscore
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def zscore_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped-map Pandas UDF):
    whole groups arrive as Arrow-backed pandas frames — the pattern for
    group-local Python math Spark lacks natively (sklearn scalers,
    per-group model scoring). One shuffle on the group key; the oracle
    is the pure-SQL window formulation, checking the Python path
    end-to-end."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        out["zscore"] = (pdf["value"] - m) / s
        return out

    res = ev.groupBy("event_type").applyInPandas(
        norm, schema="event_id long, event_type string, zscore double"
    )
    return res.select("event_id", "event_type", F.round("zscore", 6).alias("zscore"))


@register(
    "time_band_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_s
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def time_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (band) join: every click within the hour BEFORE each
    purchase by the same user. Naive form is an inequality join (cross
    product per user); the scale form here adds a BINNED equi-key —
    each purchase probes its own hour-bin and the previous one, so the
    join is an equi-join on (user_id, hour_bin) with the band predicate
    as a residual filter. Bin fan-out is 2x on the probe side only."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        (F.unix_timestamp("ts") / 3600).cast("long").alias("c_bin"),
    )
    # probe side: each purchase looks in its bin and the previous bin
    p_binned = p.withColumn(
        "p_bin",
        F.explode(
            F.array(
                (F.unix_timestamp("p_ts") / 3600).cast("long"),
                (F.unix_timestamp("p_ts") / 3600).cast("long") - 1,
            )
        ),
    )
    return (
        p_binned.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("p_bin") == F.col("c_bin"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            "purchase_id",
            "click_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
            .cast("long")
            .alias("lag_s"),
        )
        .distinct()
    )


@register(
    "value_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ==
    DuckDB quantile_cont). Exact quantiles need the full sorted group —
    fine per-key; at 100 TB the global-profile variant switches to
    approx_percentile (t-digest, mergeable sketch) and tolerates
    epsilon."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "data_profile",
    oracle="""
    SELECT 'o_totalprice' AS col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_totalprice) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           ROUND(min(o_totalprice), 6) AS min_v,
           ROUND(max(o_totalprice), 6) AS max_v,
           ROUND(avg(o_totalprice), 6) AS mean_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(count(*) AS BIGINT),
           CAST(count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           ROUND(min(o_custkey), 6), ROUND(max(o_custkey), 6),
           ROUND(avg(o_custkey), 6)
    FROM orders
    """,
)
def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (null/distinct/min/max/mean per
    column) — the data-quality survey an ingest pipeline runs before
    anything else. All columns profile in a single scan (one wide
    aggregate, no per-column jobs); exact distinct here, HLL sketch
    (approx_count_distinct) at the 100 TB end."""
    o = load_table(spark, sf_dir, "orders")
    rows = []
    for colname in ["o_totalprice", "o_custkey"]:
        rows.append(
            o.agg(
                F.lit(colname).alias("col"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(colname).alias("n_nonnull"),
                F.countDistinct(colname).alias("n_distinct"),
                F.round(F.min(colname).cast("double"), 6).alias("min_v"),
                F.round(F.max(colname).cast("double"), 6).alias("max_v"),
                F.round(F.avg(colname), 6).alias("mean_v"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "json_props_rollup",
    oracle="""
    SELECT event_type,
           CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS BIGINT)
             AS k_bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(avg(value), 6) AS avg_value
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
    """,
)
def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: `props` is a JSON string (the
    Kafka-payload shape); extract a field JVM-side with
    get_json_object, bucket it, aggregate. At 100 TB the extraction
    happens in the scan's codegen stage — no Python, no intermediate
    materialization of parsed structs (use from_json + a schema when
    MANY fields are needed; single-field extraction is cheaper this
    way)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter(k.isNotNull())
        .groupBy(
            "event_type",
            F.floor(k / 10).cast("long").alias("k_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "window_lag_delta",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             ROUND(sum(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, total,
           lag(total) OVER w AS prev_total,
           ROUND(total - COALESCE(lag(total) OVER w, total), 2) AS delta,
           CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY total, day)
                AS BIGINT) AS quartile
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day analytics: lag for the previous day's total and the
    delta, ntile(4) for volume quartiles — the lead/lag/ntile window
    family. Totals are rounded BEFORE windowing and ntile's ordering
    carries a day tiebreak, so frame contents are engine-stable. One
    shuffle on event_type; both windows share the partition key so
    Spark evaluates them in a single WindowExec pass per sort order."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day")
    wq = Window.partitionBy("event_type").orderBy("total", "day")
    prev = F.lag("total").over(w)
    return d.select(
        "event_type",
        "day",
        "total",
        prev.alias("prev_total"),
        F.round(F.col("total") - F.coalesce(prev, F.col("total")), 2).alias("delta"),
        F.ntile(4).over(wq).cast("long").alias("quartile"),
    )


@register(
    "asof_join_cogroup",
    scale_class="diagnostic",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id,
           p.user_id,
           c.value AS last_click_value,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS micros_since_click
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as `asof_join_purchase_click`, but via
    cogrouped applyInPandas + pandas merge_asof — the escape-hatch
    pattern for asymmetric two-sided group-local logic Spark lacks
    natively (completing the Pandas-UDF family: scalar, mapInPandas,
    grouped applyInPandas, cogrouped applyInPandas, withState). Both
    sides shuffle once on user_id and arrive as per-key Arrow frames.
    Same oracle as the native window formulation: three independent
    algorithms (window composition, DuckDB ASOF, merge_asof) must
    agree. Prefer the native composition in the hot path — this one
    crosses the JVM/Arrow boundary per group."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )

    def asof(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "click_ts", "click_value"]
            )
        merged = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("click_ts")[["click_ts", "click_value"]],
            left_on="ts",
            right_on="click_ts",
            direction="backward",
        )
        return merged[["event_id", "user_id", "ts", "click_ts", "click_value"]]

    joined = (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof,
            schema=(
                "event_id long, user_id long, ts timestamp, "
                "click_ts timestamp, click_value double"
            ),
        )
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("click_value").alias("last_click_value"),
        (F.unix_micros("ts") - F.unix_micros("click_ts"))
        .cast("long")
        .alias("micros_since_click"),
    )


# --- equal-width histogram ----------------------------------------------------

_HIST_LO, _HIST_HI, _HIST_NBUCKETS = 0.0, 500.0, 20


@register(
    "histogram_value_buckets",
    oracle=f"""
    -- DuckDB has no width_bucket; spell out the SQL-standard formula
    -- Spark uses: floor(n * (v - lo) / (hi - lo)) + 1, with 0 / n+1
    -- as the underflow / overflow buckets.
    SELECT event_type,
           CASE WHEN value < {_HIST_LO} THEN 0
                WHEN value >= {_HIST_HI} THEN {_HIST_NBUCKETS} + 1
                ELSE CAST(floor({_HIST_NBUCKETS} * (value - {_HIST_LO})
                          / ({_HIST_HI} - {_HIST_LO})) AS BIGINT) + 1
           END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(min(value), 6) AS lo,
           ROUND(max(value), 6) AS hi
    FROM events GROUP BY 1, 2
    """,
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram per event_type via width_bucket — the
    data-profiling shape that beats collecting values to the driver:
    bucket assignment is a codegen'd expression, the counts are one
    hash aggregation over (type, bucket) whose output is bounded by
    types × (buckets + 2) regardless of input size (out-of-range
    values land in the SQL-standard underflow/overflow buckets 0 and
    n+1 on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    b = F.width_bucket("value", F.lit(_HIST_LO), F.lit(_HIST_HI), F.lit(_HIST_NBUCKETS))
    return ev.groupBy("event_type", b.cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


# --- SCD2 dimension build -----------------------------------------------------

@register(
    "scd2_customer_priority",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev_p
      FROM orders
    ),
    runs AS (
      SELECT o_custkey, o_orderdate, o_orderpriority,
             sum(CASE WHEN prev_p IS NULL OR prev_p <> o_orderpriority
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM o
    ),
    versions AS (
      SELECT o_custkey AS c_custkey, run_id, o_orderpriority AS priority,
             min(o_orderdate) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM runs GROUP BY 1, 2, 3
    )
    SELECT c_custkey, priority,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(lead(valid_from) OVER (
             PARTITION BY c_custkey ORDER BY run_id), '%Y-%m-%d') AS valid_to,
           (lead(valid_from) OVER (
             PARTITION BY c_custkey ORDER BY run_id) IS NULL) AS is_current,
           n_orders
    FROM versions
    """,
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: collapse each customer's order-
    priority timeline into validity intervals [valid_from, valid_to)
    with an is_current flag — the warehouse pattern for turning an
    event/transaction stream into a slowly-changing dimension, via
    gaps-and-islands (lag-detect change points, running-sum run ids,
    one aggregate per run).

    Scale shape: every window partitions by c_custkey, so the whole
    build is ONE shuffle on the dimension key followed by in-partition
    sorts; the run aggregate partial-combines. Per-customer history is
    bounded (thousands of rows, not billions), so partition skew is
    capped by design — the pathological key for this op is a bot
    account, which AQE skew-split absorbs."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        F.when(
            F.lag("o_orderpriority").over(w_seq).isNull()
            | (F.lag("o_orderpriority").over(w_seq) != F.col("o_orderpriority")),
            1,
        ).otherwise(0)
    )
    runs = o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        F.sum(chg)
        .over(
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("run_id"),
    )
    versions = runs.groupBy(
        F.col("o_custkey").alias("c_custkey"),
        "run_id",
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.min("o_orderdate").alias("vf"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w_ver = Window.partitionBy("c_custkey").orderBy("run_id")
    nxt = F.lead("vf").over(w_ver)
    return versions.select(
        "c_custkey",
        "priority",
        F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_orders",
    )


# --- cohort retention ---------------------------------------------------------

@register(
    "cohort_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    cohort AS (
      SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY 1
    )
    SELECT strftime(cohort.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(datediff('day', cohort.cohort_day, activity.day) AS BIGINT)
             AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted on each subsequent active day — the product-analytics
    staple. Join-free by design: one aggregate per user collects the
    distinct active-day set (collect_set partial-combines map-side and
    dedups as it goes), the cohort day is array_min over that in-row
    set, and exploding (cohort, day) pairs feeds the tiny final
    (cohort, offset) count. Exactly TWO shuffles — corpus grain on
    user_id, then the triangle grain — where the textbook
    activity⋈cohort self-join costs three plus a join whose build side
    (one row per user) stops being broadcastable around 10^8 users.
    Per-user state is bounded by the calendar horizon (≤ a few thousand
    distinct days), so collect_set cannot blow up on any key."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    pairs = per_user.select(
        F.array_min("days").alias("cohort_day"), F.explode("days").alias("day")
    )
    return pairs.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --- MERGE INTO (SCD1 upsert) -------------------------------------------------

_MERGE_CUTOFF = "2001-01-01"


@register(
    "merge_scd1_upsert",
    oracle=f"""
    WITH tgt AS (
      SELECT o_custkey AS c_custkey,
             max(struct_pack(d := o_orderdate, k := o_orderkey,
                             p := o_orderpriority)) AS m
      FROM orders WHERE o_orderdate < DATE '{_MERGE_CUTOFF}'
      GROUP BY 1
    ),
    upd AS (
      SELECT o_custkey AS c_custkey,
             max(struct_pack(d := o_orderdate, k := o_orderkey,
                             p := o_orderpriority)) AS m
      FROM orders WHERE o_orderdate >= DATE '{_MERGE_CUTOFF}'
      GROUP BY 1
    )
    SELECT COALESCE(upd.c_custkey, tgt.c_custkey) AS c_custkey,
           COALESCE(upd.m.p, tgt.m.p) AS priority,
           strftime(COALESCE(upd.m.d, tgt.m.d), '%Y-%m-%d') AS last_orderdate,
           CASE WHEN upd.c_custkey IS NULL THEN 'KEEP'
                WHEN tgt.c_custkey IS NULL THEN 'INSERT'
                ELSE 'UPDATE' END AS op
    FROM tgt FULL OUTER JOIN upd USING (c_custkey)
    """,
)
def merge_scd1_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / SCD Type-1 upsert — the Delta/Iceberg core op,
    expressed as what the engines themselves compile it to: a full
    outer join of target and change-batch on the merge key, with
    matched rows taking the update, unmatched-source rows inserting,
    and unmatched-target rows carried through (op column = the merge
    action audit). Target = each customer's latest order priority
    before {_MERGE_CUTOFF}; updates = the same from on/after it (the
    CDC batch). Latest-row-per-key is max() over a (date, key, value)
    struct — lexicographic, partial-combining, no window sort.

    Scale shape: both sides aggregate to one row per key map-side,
    then ONE co-partitioned shuffle serves both aggregates and the
    full-outer join (same key); a real table-format MERGE adds file
    pruning on top, the join shape is identical."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_MERGE_CUTOFF).cast("date")

    def latest(side):
        return (
            side.groupBy(F.col("o_custkey").alias("c_custkey"))
            .agg(
                F.max(
                    F.struct(
                        F.col("o_orderdate").alias("d"),
                        F.col("o_orderkey").alias("k"),
                        F.col("o_orderpriority").alias("p"),
                    )
                ).alias("m")
            )
        )

    tgt = latest(o.filter(F.col("o_orderdate") < cutoff)).withColumnRenamed("m", "tm")
    upd = latest(o.filter(F.col("o_orderdate") >= cutoff)).withColumnRenamed("m", "um")
    merged = tgt.join(upd, "c_custkey", "full_outer")
    return merged.select(
        "c_custkey",
        F.coalesce(F.col("um.p"), F.col("tm.p")).alias("priority"),
        F.date_format(
            F.coalesce(F.col("um.d"), F.col("tm.d")), "yyyy-MM-dd"
        ).alias("last_orderdate"),
        F.when(F.col("um").isNull(), F.lit("KEEP"))
        .when(F.col("tm").isNull(), F.lit("INSERT"))
        .otherwise(F.lit("UPDATE"))
        .alias("op"),
    )


@register(
    "unpivot_daily_metrics",
    oracle="""
    WITH d AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             ROUND(ROUND(sum(value), 2) / count(*), 6) AS avg_value,
             CAST(count(*) AS DOUBLE) AS n_events,
             CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users
      FROM events GROUP BY 1
    )
    SELECT day, 'avg_value' AS metric, avg_value AS value FROM d
    UNION ALL
    SELECT day, 'n_events', n_events FROM d
    UNION ALL
    SELECT day, 'n_users', n_users FROM d
    """,
)
def unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt/unpivot (pivot's inverse, completing the reshape pair): a
    wide per-day metrics frame unpivoted to long (day, metric, value)
    via the native DataFrame.unpivot — an Expand node, pure map-side
    row generation with NO shuffle beyond the upstream aggregate; the
    long layout is what metric stores and plotting layers ingest. Value
    columns are cast to one type (double) first, the unpivot contract."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            # round(sum,2)/n, not round(avg,6): the boundary-stable avg
            # formulation (summation-order float drift can put avg() a
            # half-ulp either side of a 6-decimal rounding boundary)
            F.round(F.round(F.sum("value"), 2) / F.count(F.lit(1)), 6).alias(
                "avg_value"
            ),
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.count_distinct("user_id").cast("double").alias("n_users"),
        )
    )
    return wide.unpivot(
        ids=["day"],
        values=["avg_value", "n_events", "n_users"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_MAD_K = 1.4826  # consistency constant: MAD * k estimates sigma for normal data
_MAD_Z = 3.0


@register(
    "outlier_mad_robust_zscore",
    oracle=f"""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type, med, median(abs(e.value - med)) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type,
           ROUND(med, 6) AS med,
           ROUND(mad, 6) AS mad,
           ROUND((e.value - med) / ({_MAD_K} * mad), 6) AS robust_z,
           abs((e.value - med) / ({_MAD_K} * mad)) > {_MAD_Z} AS is_outlier
    FROM events e JOIN mad USING (event_type)
    WHERE mad > 0
    """,
)
def outlier_mad_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median/MAD z-score
    ((x − median) / (1.4826 · MAD)), the heavy-tail-safe alternative to
    mean/stddev z-scores (zscore_per_group) — one extreme value can
    drag a mean past its own outlier threshold, but breaks down the
    median only at 50% contamination. Exact medians via F.median
    (SURVEY A5 semantics): two grouped passes — per-type median, then
    per-type median of absolute deviations — each a map-side-combined
    aggregate over |event_type| groups, then a broadcast of the tiny
    per-type stats back onto the events scan."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    rz = (F.col("value") - F.col("med")) / (_MAD_K * F.col("mad"))
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_id",
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(rz, 6).alias("robust_z"),
            (F.abs(rz) > _MAD_Z).alias("is_outlier"),
        )
    )


@register(
    "conversion_funnel_3step",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS fv FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS fc
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.fv GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS fp
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.fc GROUP BY 1
    ),
    n AS (
      SELECT (SELECT count(*) FROM v) AS nv,
             (SELECT count(*) FROM c) AS nc,
             (SELECT count(*) FROM p) AS np
    )
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS stage, CAST(nv AS BIGINT) AS n_users,
             1.0 AS conversion FROM n
      UNION ALL
      SELECT 2, 'click', CAST(nc AS BIGINT),
             ROUND(nc * 1.0 / nullif(nv, 0), 6) FROM n
      UNION ALL
      SELECT 3, 'purchase', CAST(np AS BIGINT),
             ROUND(np * 1.0 / nullif(nc, 0), 6) FROM n
    )
    """,
)
def conversion_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user
    counts at each stage only if the stage's FIRST qualifying event
    follows their first qualifying event of the previous stage — the
    event-sequence analysis shape (product analytics' funnel report).
    Each stage is one filtered aggregate to user grain joined to the
    previous stage's user-grain table: the expensive frames shrink
    monotonically, every join is user-key-co-partitioned, and the
    final counts collapse to a 3-row report via a crossJoin of three
    1-row aggregates (no data movement)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("fv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("fc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    n = (
        v.agg(F.count(F.lit(1)).alias("nv"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("nc")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("np")))
    )
    out = n.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("step"),
                    F.lit("view").alias("stage"),
                    F.col("nv").cast("long").alias("n_users"),
                    F.lit(1.0).alias("conversion"),
                ),
                F.struct(
                    F.lit(2).alias("step"),
                    F.lit("click").alias("stage"),
                    F.col("nc").cast("long").alias("n_users"),
                    F.round(
                        F.col("nc") / F.nullif(F.col("nv"), F.lit(0)), 6
                    ).alias("conversion"),
                ),
                F.struct(
                    F.lit(3).alias("step"),
                    F.lit("purchase").alias("stage"),
                    F.col("np").cast("long").alias("n_users"),
                    F.round(
                        F.col("np") / F.nullif(F.col("nc"), F.lit(0)), 6
                    ).alias("conversion"),
                ),
            )
        ).alias("r")
    ).select("r.step", "r.stage", "r.n_users", "r.conversion")
    return out


@register(
    "variant_props_extract",
    oracle="""
    WITH t AS (
      -- TRY_CAST mirrors Spark's try_variant_get(..., 'int') semantics:
      -- a non-integer $.k becomes NULL and is filtered, instead of
      -- hard-erroring the oracle while Spark silently drops the row.
      SELECT event_type,
             TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_parsed,
           ROUND(avg(k), 6) AS avg_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM t
    WHERE k IS NOT NULL
    GROUP BY 1
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured processing on Spark 4's VARIANT type:
    `try_parse_json` turns the JSON payload column into a binary
    variant ONCE (corrupt documents become NULL, never a job failure),
    then `try_variant_get` path-extracts with a type cast. Versus
    per-field get_json_object (json_props_rollup), the variant parse
    is paid once per row no matter how many fields are later
    extracted, and the binary encoding skips re-tokenizing the JSON
    text — the right shape when a Kafka payload has many consumed
    fields. The DuckDB oracle is its native JSON path — two
    independent semi-structured engines must agree."""
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parsed"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


_EQD_BUCKETS = 10


@register(
    "histogram_equidepth_value",
    scale_class="diagnostic",
    oracle=f"""
    WITH t AS (
      SELECT value, ntile({_EQD_BUCKETS}) OVER (ORDER BY value, event_id)
               AS bucket
      FROM events
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           ROUND(min(value), 6) AS lo,
           ROUND(max(value), 6) AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY 1
    """,
)
def histogram_equidepth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram ({_EQD_BUCKETS} buckets of equal row count,
    data-dependent boundaries) — the complement of the equal-WIDTH
    histogram_value_buckets, and what query optimizers and drift
    monitors actually want (equal-width collapses under skew). Exact
    ntile needs a total order, so this formulation single-partition
    sorts — correct at test scale and for the oracle; the 100 TB
    recipe is documented here: compute boundary values with
    approx_percentile (one aggregate, no global sort), then assign
    buckets with a broadcast range join against the ≤{_EQD_BUCKETS}-row
    boundary table. Tie-break on event_id makes the exact variant
    engine-deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    t = ev.select("value", "event_id", F.ntile(_EQD_BUCKETS).over(w).alias("bucket"))
    return t.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


_DRIFT_PIVOT = "2024-01-16"  # first half vs second half of the month


@register(
    "drift_ks_value",
    scale_class="diagnostic",
    oracle=f"""
    WITH t AS (
      SELECT event_type, value, event_id,
             CASE WHEN ts < TIMESTAMP '{_DRIFT_PIVOT}' THEN 1 ELSE 0 END AS in_a
      FROM events
    ),
    n AS (
      SELECT event_type,
             sum(in_a) AS n_a, count(*) - sum(in_a) AS n_b
      FROM t GROUP BY 1
    ),
    c AS (
      SELECT t.event_type, t.value,
             sum(in_a) OVER w * 1.0 / n.n_a
               - sum(1 - in_a) OVER w * 1.0 / n.n_b AS diff,
             lead(t.value) OVER (PARTITION BY t.event_type
                                 ORDER BY value, event_id) AS next_value,
             n.n_a, n.n_b
      FROM t JOIN n USING (event_type)
      WINDOW w AS (PARTITION BY t.event_type ORDER BY value, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(max(abs(diff)), 6) AS ks_stat
    FROM c
    WHERE next_value IS NULL OR next_value <> value
    GROUP BY 1, 2, 3
    """,
)
def drift_ks_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection: exact two-sample Kolmogorov–
    Smirnov statistic on `value` per event_type, first half of the
    month vs second (the train/serve-skew monitor every production
    scoring pipeline wants). KS = max |ECDF_A − ECDF_B|, computed as
    one running-count window over the per-type value order — no
    collect, no Python, one sort per type key. The diff is sampled
    only at the last row of each distinct value group (lead() over the
    same order), so tied values contribute one complete-point ECDF
    evaluation and the emitted number is exactly the KS D. At 100 TB
    the exact per-type sort gives way to a binned ECDF — see
    drift_ks_binned, the registered scale variant."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        "value",
        "event_id",
        (F.col("ts") < F.lit(_DRIFT_PIVOT).cast("timestamp"))
        .cast("int")
        .alias("in_a"),
    )
    n = t.groupBy("event_type").agg(
        F.sum("in_a").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("in_a")).alias("n_b"),
    )
    wo = Window.partitionBy("event_type").orderBy("value", "event_id")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = t.join(n, "event_type").select(
        "event_type",
        "value",
        "n_a",
        "n_b",
        (
            F.sum("in_a").over(w) / F.col("n_a")
            - F.sum(1 - F.col("in_a")).over(w) / F.col("n_b")
        ).alias("diff"),
        # Sample the running diff only at the LAST row of each distinct
        # value group: tied values then contribute one complete-point
        # ECDF evaluation instead of inflated intra-tie prefixes, so
        # the max below is exactly the two-sample KS D statistic.
        F.lead("value").over(wo).alias("next_value"),
    )
    c = c.filter(
        F.col("next_value").isNull() | (F.col("next_value") != F.col("value"))
    )
    return c.groupBy(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    ).agg(F.round(F.max(F.abs("diff")), 6).alias("ks_stat"))


@register(
    "drift_chi2_event_mix",
    oracle=f"""
    WITH t AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '{_DRIFT_PIVOT}' THEN 'a' ELSE 'b' END
               AS win,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, win, o,
             sum(o) OVER (PARTITION BY event_type) AS row_tot,
             sum(o) OVER (PARTITION BY win) AS col_tot,
             sum(o) OVER () AS grand
      FROM t
    )
    SELECT event_type,
           CAST(sum(CASE WHEN win = 'a' THEN o ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN win = 'b' THEN o ELSE 0 END) AS BIGINT) AS n_b,
           ROUND(sum(pow(o - row_tot * col_tot * 1.0 / grand, 2)
                     / (row_tot * col_tot * 1.0 / grand)), 6) AS chi2_contrib
    FROM m GROUP BY 1
    """,
)
def drift_chi2_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-mix drift: per-type chi-square contribution of the
    observed (type × half-month) contingency table vs independence —
    the companion to drift_ks_value for CATEGORICAL columns (did the
    event-type mix shift between windows?). The contingency table is
    |types|×2 rows, so everything after the first aggregate —
    marginals, expectations, contributions — runs on a frame that
    would fit on one executor at any corpus size; the only full-data
    pass is the initial map-side-combined count."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy(
        "event_type",
        F.when(F.col("ts") < F.lit(_DRIFT_PIVOT).cast("timestamp"), "a")
        .otherwise("b")
        .alias("win"),
    ).agg(F.count(F.lit(1)).alias("o"))
    m = t.select(
        "event_type",
        "win",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("win")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("grand"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("grand")
    return m.groupBy("event_type").agg(
        F.sum(F.when(F.col("win") == "a", F.col("o")).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("win") == "b", F.col("o")).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2_contrib"),
    )


# Fixed fine-grid binning: the shared scale trick behind the *_approx /
# *_binned variants below. One min/max scalar aggregate fixes the grid;
# bin assignment is pure arithmetic (identical IEEE-double ops on both
# engines), so the only full-data pass is a map-side-combined hash
# aggregate and every window/sort downstream runs on a <= _FINE_BINS-row
# frame. Grid resolution bounds the approximation error: equi-depth
# bucket counts are off by at most one bin's population, and the binned
# KS statistic is the exact D evaluated at bin boundaries (error <= the
# largest single-bin ECDF mass, <= ~1/_FINE_BINS for smooth data).
_FINE_BINS = 1024


def _grid_bin(value: F.Column, nbins: int = _FINE_BINS) -> F.Column:
    """Bin index on the [vmin, vmax] grid (expects vmin/vmax columns in
    scope from the broadcast stats row); clamped so value == vmax lands
    in the top bin, degenerate vmin == vmax collapses to bin 0."""
    span = F.col("vmax") - F.col("vmin")
    raw = F.floor((value - F.col("vmin")) * nbins / span)
    return (
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0).cast("long"))
        .otherwise(F.least(raw, F.lit(nbins - 1).cast("long")))
    )


def _grid_bin_sql(nbins: int = _FINE_BINS) -> str:
    """The same arithmetic, spelled for the DuckDB oracle (operand
    order matters: both engines must run the identical IEEE-double
    expression for the bin assignment to be engine-deterministic)."""
    return f"""CASE WHEN s.vmax = s.vmin THEN 0
               ELSE CAST(least(floor((e.value - s.vmin) * {nbins}
                                     / (s.vmax - s.vmin)),
                               {nbins - 1}) AS BIGINT) END"""


def _fine_bin(value: F.Column) -> F.Column:
    return _grid_bin(value, _FINE_BINS)


_FINE_BIN_SQL = _grid_bin_sql(_FINE_BINS)


@register(
    "histogram_equidepth_approx",
    oracle=f"""
    WITH s AS (
      SELECT min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT {_FINE_BIN_SQL} AS bin, e.value
      FROM events e CROSS JOIN s
      WHERE e.value IS NOT NULL
    ),
    g AS (
      SELECT bin, count(*) AS cnt, min(value) AS blo, max(value) AS bhi
      FROM b GROUP BY 1
    ),
    c AS (
      SELECT bin, cnt, blo, bhi,
             sum(cnt) OVER (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cnt AS cum_before,
             sum(cnt) OVER () AS tot
      FROM g
    )
    SELECT CAST(least(floor(cum_before * {_EQD_BUCKETS} * 1.0 / tot),
                      {_EQD_BUCKETS - 1}) + 1 AS BIGINT) AS bucket,
           ROUND(min(blo), 6) AS lo,
           ROUND(max(bhi), 6) AS hi,
           CAST(sum(cnt) AS BIGINT) AS n
    FROM c GROUP BY 1
    """,
)
def histogram_equidepth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram, the 100 TB shape (scale twin of the exact
    histogram_equidepth_value, whose ntile needs a single-partition
    global sort): bin rows onto the fixed _FINE_BINS grid with one
    map-side-combined hash aggregate — the ONLY full-data pass — then
    derive bucket boundaries from cumulative counts over the <= 1024-row
    bin table. Each bin lands wholly in the equi-depth bucket of its
    first row (floor(cum_before*K/tot)), so bucket populations are equal
    up to one bin's count; lo/hi come from per-bin min/max of the real
    values, not grid edges. No global sort ever touches the raw table —
    the window's sort input is the aggregated bin frame (plan-asserted
    in tests/test_scale_plans.py). Every arithmetic step is the same
    IEEE-double expression in the DuckDB oracle, so the approximation is
    engine-deterministic and fully hash-checked."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    b = ev.crossJoin(F.broadcast(s)).select(
        _fine_bin(F.col("value")).alias("bin"), "value"
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("value").alias("blo"),
        F.max("value").alias("bhi"),
    )
    wo = Window.orderBy("bin")
    c = g.select(
        "cnt",
        "blo",
        "bhi",
        (
            F.sum("cnt").over(
                wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("cnt")
        ).alias("cum_before"),
        F.sum("cnt").over(Window.partitionBy()).alias("tot"),
    )
    bucket = (
        F.least(
            F.floor(F.col("cum_before") * _EQD_BUCKETS * F.lit(1.0) / F.col("tot")),
            F.lit(_EQD_BUCKETS - 1).cast("long"),
        )
        + F.lit(1)
    ).cast("long")
    return c.groupBy(bucket.alias("bucket")).agg(
        F.round(F.min("blo"), 6).alias("lo"),
        F.round(F.max("bhi"), 6).alias("hi"),
        F.sum("cnt").cast("long").alias("n"),
    )


@register(
    "drift_ks_binned",
    oracle=f"""
    WITH s AS (
      SELECT min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL
    ),
    t AS (
      SELECT e.event_type,
             {_FINE_BIN_SQL} AS bin,
             CASE WHEN e.ts < TIMESTAMP '{_DRIFT_PIVOT}' THEN 1 ELSE 0 END
               AS in_a
      FROM events e CROSS JOIN s
      WHERE e.value IS NOT NULL
    ),
    g AS (
      SELECT event_type, bin,
             sum(in_a) AS a_cnt, sum(1 - in_a) AS b_cnt
      FROM t GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type,
             sum(a_cnt) OVER w AS cum_a, sum(b_cnt) OVER w AS cum_b,
             sum(a_cnt) OVER p AS n_a, sum(b_cnt) OVER p AS n_b
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             p AS (PARTITION BY event_type)
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(max(abs(cum_a * 1.0 / n_a - cum_b * 1.0 / n_b)), 6)
             AS ks_stat
    FROM c GROUP BY 1, 2, 3
    """,
)
def drift_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift statistic, the 100 TB shape (scale twin of
    drift_ks_value, whose per-event_type running window full-sorts each
    type's entire history through one task — a skewed-key scale-killer
    on a low-cardinality partition key). Here both half-month samples
    are histogrammed onto the shared _FINE_BINS grid in ONE map-side-
    combined aggregate; the per-type ECDF walk then runs over at most
    |types| x 1024 aggregated rows, and per-type totals come from a
    partition window on that same tiny frame (no second scan, no join
    back). The result is the exact KS D evaluated at bin boundaries —
    a lower bound within max single-bin mass of the true D, identical
    in both engines, fully hash-checked. No sort over the raw table
    (plan-asserted in tests/test_scale_plans.py)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    t = ev.crossJoin(F.broadcast(s)).select(
        "event_type",
        _fine_bin(F.col("value")).alias("bin"),
        (F.col("ts") < F.lit(_DRIFT_PIVOT).cast("timestamp"))
        .cast("int")
        .alias("in_a"),
    )
    g = t.groupBy("event_type", "bin").agg(
        F.sum("in_a").alias("a_cnt"),
        F.sum(1 - F.col("in_a")).alias("b_cnt"),
    )
    wp = Window.partitionBy("event_type")
    w = wp.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.select(
        "event_type",
        F.sum("a_cnt").over(w).alias("cum_a"),
        F.sum("b_cnt").over(w).alias("cum_b"),
        F.sum("a_cnt").over(wp).alias("n_a"),
        F.sum("b_cnt").over(wp).alias("n_b"),
    )
    return c.groupBy(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    ).agg(
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a") * F.lit(1.0) / F.col("n_a")
                    - F.col("cum_b") * F.lit(1.0) / F.col("n_b")
                )
            ),
            6,
        ).alias("ks_stat")
    )


_PSI_BINS = 10  # the conventional PSI bin count
_PSI_EPS = 0.5  # Laplace smoothing per bin (keeps log finite on empties)
# Float literals reach DuckDB in e-notation so they parse as IEEE
# DOUBLE, never DECIMAL (the e-notation rule, SKILL.md): with a bare
# `0.5` the hash only matched because the 0.5-family happens to be
# exactly representable — any other _PSI_EPS would silently diverge.
_PSI_EPS_SQL = f"{_PSI_EPS!r}e0"
_PSI_DENOM_SQL = f"{_PSI_EPS * _PSI_BINS!r}e0"


# Shared with streaming_drift_psi (streaming_q.py): the streaming
# bin-count state must converge to the identical batch counts, so both
# register() calls pass this same oracle SQL.
DRIFT_PSI_ORACLE = f"""
    WITH s AS (
      SELECT min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL
    ),
    t AS (
      SELECT e.event_type,
             {_grid_bin_sql(_PSI_BINS)} AS bin,
             CASE WHEN e.ts < TIMESTAMP '{_DRIFT_PIVOT}' THEN 1 ELSE 0 END
               AS in_a
      FROM events e CROSS JOIN s
      WHERE e.value IS NOT NULL
    ),
    g0 AS (
      SELECT event_type, bin,
             sum(in_a) AS a_cnt, sum(1 - in_a) AS b_cnt
      FROM t GROUP BY 1, 2
    ),
    g AS (
      SELECT grid.event_type, grid.bin,
             coalesce(g0.a_cnt, 0) AS a_cnt, coalesce(g0.b_cnt, 0) AS b_cnt
      FROM (SELECT et.event_type, r.range AS bin
            FROM (SELECT DISTINCT event_type FROM t) et
            CROSS JOIN range({_PSI_BINS}) r) grid
      LEFT JOIN g0
        ON grid.event_type = g0.event_type AND grid.bin = g0.bin
    ),
    c AS (
      SELECT event_type, a_cnt, b_cnt,
             sum(a_cnt) OVER p AS n_a, sum(b_cnt) OVER p AS n_b
      FROM g
      WINDOW p AS (PARTITION BY event_type)
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(sum(
             ((a_cnt + {_PSI_EPS_SQL}) * 1e0 / (n_a + {_PSI_DENOM_SQL})
              - (b_cnt + {_PSI_EPS_SQL}) * 1e0 / (n_b + {_PSI_DENOM_SQL}))
             * ln(((a_cnt + {_PSI_EPS_SQL}) * 1e0 / (n_a + {_PSI_DENOM_SQL}))
                  / ((b_cnt + {_PSI_EPS_SQL}) * 1e0 / (n_b + {_PSI_DENOM_SQL})))
           ), 6) AS psi
    FROM c GROUP BY 1, 2, 3
    """


def psi_finish(spark: SparkSession, g0: DataFrame) -> DataFrame:
    """(event_type, bin, a_cnt, b_cnt) observed-bin counts → the PSI
    scorecard: densify to the full grid, per-type totals, smoothed
    divergence sum. Shared by the batch query and the streaming state
    read-back so both paths are held to the same oracle."""
    from pyspark.sql import Window

    # cached: the grid branch (distinct types) and the left join both
    # consume g0; uncached, Catalyst re-runs the full corpus count for
    # each consumer (the subtree-sharing hazard profile_table pins) —
    # the frame is <= |types| x 10 rows
    g0 = g0.cache()
    # self-join disambiguation: grid derives from g0, and a plain join
    # back onto g0 leaves BOTH sides carrying the same attribute ids
    # (conflicting-references analyzer error, surfaced by the
    # streaming memory-sink read-back). Re-aliasing the observed side's
    # key columns mints fresh attributes, making the join unambiguous.
    grid = (
        g0.select("event_type")
        .distinct()
        .crossJoin(spark.range(_PSI_BINS).select(F.col("id").alias("bin")))
    )
    o = g0.select(
        F.col("event_type").alias("o_event_type"),
        F.col("bin").alias("o_bin"),
        "a_cnt",
        "b_cnt",
    )
    g = grid.join(
        o,
        (grid["event_type"] == o["o_event_type"]) & (grid["bin"] == o["o_bin"]),
        "left",
    ).select(
        grid["event_type"].alias("event_type"),
        grid["bin"].alias("bin"),
        F.coalesce("a_cnt", F.lit(0)).alias("a_cnt"),
        F.coalesce("b_cnt", F.lit(0)).alias("b_cnt"),
    )
    wp = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        "a_cnt",
        "b_cnt",
        F.sum("a_cnt").over(wp).alias("n_a"),
        F.sum("b_cnt").over(wp).alias("n_b"),
    )
    denom = _PSI_EPS * _PSI_BINS
    pa = (F.col("a_cnt") + _PSI_EPS) * F.lit(1.0) / (F.col("n_a") + denom)
    pb = (F.col("b_cnt") + _PSI_EPS) * F.lit(1.0) / (F.col("n_b") + denom)
    return c.groupBy(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    ).agg(F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"))


def psi_observations(spark: SparkSession, sf_dir: str):
    """(frozen-grid stats row, observation projector): the monitoring
    grid (vmin/vmax) is computed ONCE from the reference table — a
    production monitor freezes it at deploy time — and the returned
    closure projects any events frame to (event_type, bin, in_a)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))

    def project(df: DataFrame) -> DataFrame:
        return df.filter(F.col("value").isNotNull()).crossJoin(
            F.broadcast(s)
        ).select(
            "event_type",
            _grid_bin(F.col("value"), _PSI_BINS).alias("bin"),
            (F.col("ts") < F.lit(_DRIFT_PIVOT).cast("timestamp"))
            .cast("int")
            .alias("in_a"),
        )

    return s, project


@register("drift_psi_value", oracle=DRIFT_PSI_ORACLE)
def drift_psi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type, first half-month vs
    second — the third drift monitor next to drift_ks_binned
    (distributional distance) and drift_chi2_event_mix (categorical
    mix): PSI is what model-risk teams actually threshold (<0.1 stable,
    >0.25 shifted). Same scale shape as the binned KS: one map-side-
    combined (type, bin) count over the conventional 10-bin equal-width
    grid is the only full-data pass; per-type totals come from a
    partition window over the <= |types| x 10-row frame. Laplace
    smoothing (+0.5 per bin) keeps the log finite when a bin is empty
    on one side — the standard fix, applied identically in the DuckDB
    oracle so the statistic is engine-deterministic. The (type, bin)
    frame is densified to the full {_PSI_BINS}-bin grid before summing
    (a broadcast cross of distinct types x range({_PSI_BINS}), still
    aggregate-sized), so bins empty on BOTH sides contribute their
    textbook nonzero smoothed term when n_a != n_b — this is the
    standard 10-bin smoothed PSI, not an only-observed-bins variant."""
    ev = load_table(spark, sf_dir, "events")
    _, project = psi_observations(spark, sf_dir)
    g0 = project(ev).groupBy("event_type", "bin").agg(
        F.sum("in_a").alias("a_cnt"),
        F.sum(1 - F.col("in_a")).alias("b_cnt"),
    )
    return psi_finish(spark, g0)


# --- HyperLogLog cardinality sketch (r4) ------------------------------------

_HLL_B = 8                     # 2^8 = 256 registers
_HLL_M = 1 << _HLL_B
# alpha_m * m^2 (Flajolet et al. 2007 bias constant for m >= 128),
# computed once in Python; repr() round-trips to the identical double
# in both engines' literal parsers.
_HLL_AMM = 0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M
# 60-bit hash = 8-bit register index + 52-bit rank word
_HLL_RANK_MAX = 60 - _HLL_B + 1


@register(
    "hll_distinct_users",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hash
      FROM events
    ),
    r AS (
      SELECT event_type, hash % {_HLL_M} AS bucket,
             max(CASE WHEN hash // {_HLL_M} = 0 THEN {_HLL_RANK_MAX}
                      ELSE {_HLL_RANK_MAX} - length(bin(hash // {_HLL_M}))
                 END) AS m_rank
      FROM h GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             sum(pow(2e0, -m_rank)) AS s_present,
             count(*) AS c_present
      FROM r GROUP BY 1
    ),
    est AS (
      SELECT event_type,
             {_HLL_AMM!r} / (s_present + ({_HLL_M} - c_present) * 1e0) AS raw,
             {_HLL_M} - c_present AS zeros
      FROM agg
    ),
    x AS (
      SELECT event_type,
             CASE WHEN raw <= 2.5e0 * {_HLL_M} AND zeros > 0
                  THEN {_HLL_M} * ln({_HLL_M} * 1e0 / zeros)
                  ELSE raw END AS estimate
      FROM est
    ),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events
      GROUP BY 1
    )
    SELECT x.event_type,
           CAST(ex.n_exact AS BIGINT) AS n_exact,
           ROUND(x.estimate, 2) AS hll_estimate,
           ROUND(abs(x.estimate - ex.n_exact) / ex.n_exact, 4) AS rel_err
    FROM x JOIN ex USING (event_type)
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed cardinality sketch, built from first principles so
    BOTH engines compute the identical estimate: a {_HLL_M}-register
    HyperLogLog over md5-hashed user ids per event_type, reported next
    to the exact distinct count with its realized relative error
    (expected ~1.04/sqrt({_HLL_M}) = 6.5%). Why it matters at 100 TB:
    the register table is the WHOLE state — max(rank) per (key, bucket)
    is map-side combinable (max is HLL's merge operator), so distinct-
    counting any number of keys costs one narrow shuffle of <= keys x
    {_HLL_M} tiny rows instead of the count(DISTINCT) re-shuffle of
    every raw id; registers from disjoint shards union by max, which
    is how the sketch serves incremental / cross-partition rollups.
    Engine determinism: the hash is the repo's standard 60-bit
    md5-prefix integer (functions/text.py:token_hash_sql); register
    index / rank-word split is integer div/mod; the leading-zero rank
    is EXACT integer logic via length(bin(w)) (no float log2); the
    bias constant embeds one repr()-round-tripped double; and the
    small-range linear-counting correction applies the same CASE on
    both sides. Spark's native approx_count_distinct (HLL++) would be
    one call but is NOT reproducible in DuckDB — this one is, so the
    sketch itself is hash-checked, not rows-only."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hash"),
    )
    w = F.expr(f"hash div {_HLL_M}")
    rank = F.when(w == 0, F.lit(_HLL_RANK_MAX)).otherwise(
        F.lit(_HLL_RANK_MAX) - F.length(F.bin(w))
    )
    r = (
        h.select("event_type", (F.col("hash") % _HLL_M).alias("bucket"), rank.alias("rk"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rk").alias("m_rank"))
    )
    agg = r.groupBy("event_type").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_rank"))).alias("s_present"),
        F.count(F.lit(1)).alias("c_present"),
    )
    raw = F.lit(_HLL_AMM) / (
        F.col("s_present") + (F.lit(_HLL_M) - F.col("c_present")) * F.lit(1.0)
    )
    zeros = F.lit(_HLL_M) - F.col("c_present")
    est = agg.select(
        "event_type",
        F.when(
            (raw <= F.lit(2.5) * _HLL_M) & (zeros > 0),
            F.lit(_HLL_M) * F.log(F.lit(_HLL_M) * F.lit(1.0) / zeros),
        )
        .otherwise(raw)
        .alias("estimate"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return est.join(ex, "event_type").select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(F.col("estimate"), 2).alias("hll_estimate"),
        F.round(
            F.abs(F.col("estimate") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


@register(
    "window_rank_family",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             ROUND(sum(value), 2) AS day_value
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, day_value,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w, 6) AS prnk,
           ROUND(cume_dist() OVER w, 6) AS cdist,
           nth_value(day, 2) OVER (PARTITION BY event_type
                                   ORDER BY day_value DESC, day
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS second_best_day
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day_value DESC, day)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface in one query — rank,
    dense_rank, percent_rank, cume_dist, nth_value — ranking each
    event_type's days by daily revenue. The window runs AFTER the
    daily pre-aggregate, so its sort input is |types| x |days| rows no
    matter how many raw events exist (the same aggregate-before-window
    discipline as the binned drift queries; a window directly over raw
    events would be the per-type full sort drift_ks_value is being
    retired for). day_value is rounded BEFORE ranking so float ulps
    cannot flip rank order between engines; (value, day) tie-break
    pins total order."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("day_value"), F.asc("day")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return d.select(
        "event_type",
        "day",
        "day_value",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.nth_value("day", 2).over(wf).alias("second_best_day"),
    )


# --- Bloom-filter semi-join prefilter (r4) ----------------------------------

_BLOOM_M = 512  # bits — sized so the false-positive mechanism is OBSERVABLE
_BLOOM_K = 3    # hash functions
_BLOOM_CUTOFF = "2024-01-03"  # build side: users who purchased BEFORE this


def _bloom_pos_sql(j: int) -> str:
    from dataengineeringproject_spark.functions.text import token_hash_sql

    return (
        f"{token_hash_sql('CAST(user_id AS VARCHAR)', f'bloom{j}')} % {_BLOOM_M}"
    )


# Shared with streaming_bloom_dedup (streaming_q.py): the streaming
# filter's bit set must converge to the identical batch filter, so
# both register() calls pass this same oracle SQL.
BLOOM_PREFILTER_ORACLE = f"""
    WITH purch AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '{_BLOOM_CUTOFF}'
    ),
    bits AS (
      SELECT list(DISTINCT pos) AS bits FROM (
        SELECT unnest([{", ".join(_bloom_pos_sql(j) for j in range(_BLOOM_K))}])
               AS pos
        FROM purch
      )
    ),
    clicks AS (SELECT user_id FROM events WHERE event_type = 'click'),
    pass AS (
      SELECT count(*) AS n_bloom_pass
      FROM clicks, bits
      WHERE {" AND ".join(
          f"list_contains(bits, {_bloom_pos_sql(j)})" for j in range(_BLOOM_K)
      )}
    ),
    tru AS (
      SELECT count(*) AS n_true_match FROM clicks
      WHERE user_id IN (SELECT user_id FROM purch)
    )
    SELECT CAST((SELECT count(*) FROM purch) AS BIGINT) AS n_keys,
           CAST((SELECT count(*) FROM clicks) AS BIGINT) AS n_probe,
           CAST(pass.n_bloom_pass AS BIGINT) AS n_bloom_pass,
           CAST(tru.n_true_match AS BIGINT) AS n_true_match,
           ROUND((pass.n_bloom_pass - tru.n_true_match) * 1e0
                 / nullif((SELECT count(*) FROM clicks) - tru.n_true_match, 0),
                 6) AS fp_rate
    FROM pass, tru
    """


def _bloom_pos(j: int) -> F.Column:
    from dataengineeringproject_spark.functions.text import token_hash

    return (
        token_hash(F.col("user_id").cast("string"), seed=f"bloom{j}")
        % _BLOOM_M
    )


def bloom_readback(spark: SparkSession, sf_dir: str, bits: DataFrame) -> DataFrame:
    """Probe the click stream through a built Bloom filter and report
    the prefilter scorecard (n_keys/n_probe/n_bloom_pass/n_true_match/
    fp_rate). `bits` is the 1-row (bits: array<bigint>) filter — built
    batch-side by bloom_prefilter_join, or recovered from streaming
    state by streaming_bloom_dedup; everything downstream (and the
    oracle) is shared, so the two paths are held to the same hash."""
    ev = load_table(spark, sf_dir, "events")
    purch = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") < F.lit(_BLOOM_CUTOFF).cast("timestamp"))
        )
        .select("user_id")
        .distinct()
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    passed = (
        clicks.crossJoin(F.broadcast(bits))
        .filter(
            # probe predicate generated from the same _BLOOM_K as the
            # build side and the oracle, so bumping k can't silently
            # probe with fewer hashes than the filter was built with
            reduce(
                lambda a, b: a & b,
                [F.array_contains("bits", _bloom_pos(j)) for j in range(_BLOOM_K)],
            )
        )
        .agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    )
    tru = (
        clicks.join(purch, "user_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_true_match"))
    )
    nk = purch.agg(F.count(F.lit(1)).alias("n_keys"))
    np_ = clicks.agg(F.count(F.lit(1)).alias("n_probe"))
    out = (
        nk.crossJoin(np_).crossJoin(passed).crossJoin(tru)
    )
    return out.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_probe").cast("long").alias("n_probe"),
        F.col("n_bloom_pass").cast("long").alias("n_bloom_pass"),
        F.col("n_true_match").cast("long").alias("n_true_match"),
        F.round(
            (F.col("n_bloom_pass") - F.col("n_true_match"))
            * F.lit(1.0)
            / F.nullif(
                F.col("n_probe") - F.col("n_true_match"), F.lit(0)
            ),
            6,
        ).alias("fp_rate"),
    )


@register("bloom_prefilter_join", oracle=BLOOM_PREFILTER_ORACLE)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, built deterministically so both
    engines compute the IDENTICAL filter: a {_BLOOM_M}-bit /
    {_BLOOM_K}-hash Bloom filter over purchase-side user ids probes
    the click stream before the exact semi join. Why it matters at
    100 TB: a semi join shuffles the probe side on the join key; the
    Bloom filter is a {_BLOOM_M}-bit broadcast that eliminates most
    non-matching probe rows AT THE SCAN (this is what Spark's runtime
    row-level filtering / Parquet bloom pushdown do internally —
    built explicitly here so the mechanism and its false-positive
    rate are measurable and oracle-checked). The query reports build
    cardinality, probe cardinality, bloom-pass count, true match
    count, and the realized fp rate among true negatives (expected
    ~(1 - e^(-kn/m))^k). Hashes are the repo-standard md5-prefix
    integers with per-hash seeds; the bit set aggregates to ONE
    bounded array row (<= {_BLOOM_M} positions) that broadcasts —
    never a shuffle of the probe side before the filter."""
    ev = load_table(spark, sf_dir, "events")
    purch = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") < F.lit(_BLOOM_CUTOFF).cast("timestamp"))
        )
        .select("user_id")
        .distinct()
    )
    bits = purch.select(
        F.explode(
            F.array(*[_bloom_pos(j) for j in range(_BLOOM_K)])
        ).alias("p")
    ).agg(F.collect_set("p").alias("bits"))
    return bloom_readback(spark, sf_dir, bits)


# --- Count-Min sketch heavy hitters (r4) ------------------------------------

_CMS_D = 4     # depth: independent hash rows
_CMS_W = 256   # width: counters per row
_CMS_TOPK = 10


def _cms_bucket_sql(j: int, expr: str = "CAST(user_id AS VARCHAR)") -> str:
    from dataengineeringproject_spark.functions.text import token_hash_sql

    return f"{token_hash_sql(expr, f'cms{j}')} % {_CMS_W}"


# Shared with streaming_cms_heavy_hitters (streaming_q.py): the
# streaming sketch must equal the batch CMS bit-for-bit, so both
# register() calls pass this same oracle SQL.
CMS_HEAVY_HITTERS_ORACLE = f"""
    WITH sketch AS (
      SELECT j, bucket, count(*) AS c FROM (
        SELECT unnest([{", ".join(str(j) for j in range(_CMS_D))}]) AS j,
               unnest([{", ".join(_cms_bucket_sql(j) for j in range(_CMS_D))}])
                 AS bucket
        FROM events
      ) GROUP BY 1, 2
    ),
    top AS (
      SELECT user_id, count(*) AS n_exact,
             row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rnk
      FROM events GROUP BY 1
      QUALIFY rnk <= {_CMS_TOPK}
    ),
    est AS (
      SELECT t.user_id, t.n_exact, t.rnk, min(s.c) AS cms_estimate
      FROM top t, (SELECT unnest([{", ".join(str(j) for j in range(_CMS_D))}])
                   AS j) js
      JOIN sketch s
        ON s.j = js.j
       AND s.bucket = CASE js.j
             {" ".join(f"WHEN {j} THEN {_cms_bucket_sql(j, 'CAST(t.user_id AS VARCHAR)')}" for j in range(_CMS_D))}
           END
      GROUP BY 1, 2, 3
    )
    SELECT user_id, CAST(rnk AS BIGINT) AS rnk,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(cms_estimate - n_exact AS BIGINT) AS overestimate
    FROM est
    """


@register("cms_heavy_hitters", oracle=CMS_HEAVY_HITTERS_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation, engine-deterministic like
    the HLL twin: a {_CMS_D}x{_CMS_W} counter sketch over the event
    stream's user ids, read back for the top-{_CMS_TOPK} exact heavy
    hitters with the classic min-over-rows estimate and its realized
    overestimate (CMS never underestimates; expected error <=
    2N/{_CMS_W} with prob 1-(1/2)^{_CMS_D}). Scale story: the sketch
    state is {_CMS_D}x{_CMS_W} integers built in ONE map-side-combined
    aggregate — per-key frequency queries over an unbounded key space
    then cost a broadcast lookup instead of a full groupBy, and
    sketches from disjoint shards merge by cell-wise ADD (counts are
    linear), the property that makes CMS the streaming/telemetry
    workhorse. Hashes are seeded md5-prefix integers; every step is
    mirrored in the DuckDB oracle, so the sketch content itself is
    hash-checked. The exact top-{_CMS_TOPK} ranking (count desc,
    user_id) is computed independently on both sides as the read-back
    probe set."""
    from dataengineeringproject_spark.functions.text import token_hash

    ev = load_table(spark, sf_dir, "events")

    def bucket(j: int, col: F.Column) -> F.Column:
        return token_hash(col.cast("string"), seed=f"cms{j}") % _CMS_W

    sketch = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            bucket(j, F.col("user_id")).alias("bucket"),
                        )
                        for j in range(_CMS_D)
                    ]
                )
            ).alias("s")
        )
        .select("s.j", "s.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition heap
    # + driver merge — no global sort of the user-grain table), rank
    # attached afterwards on the k-row result.
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(_CMS_TOPK)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("n_exact"), F.asc("user_id"))
            ),
        )
    )
    probes = top.select(
        "user_id",
        "n_exact",
        "rnk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("user_id")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("user_id", "n_exact", "rnk", "p.j", "p.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "n_exact", "rnk")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("n_exact")).cast("long").alias("overestimate"),
    )


# Shared HLL pieces for the rollup / streaming variants: hash → (bucket,
# rank) projection and the register-table → estimate finisher, with SQL
# twins built from the same constants.


def _hll_bucket_rank(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Project rows to (keys..., bucket, rk) — the HLL observation."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    d = df.select(*key_cols, h.alias("__h"))
    w = F.expr(f"__h div {_HLL_M}")
    rank = F.when(w == 0, F.lit(_HLL_RANK_MAX)).otherwise(
        F.lit(_HLL_RANK_MAX) - F.length(F.bin(w))
    )
    return d.select(*key_cols, (F.col("__h") % _HLL_M).alias("bucket"), rank.alias("rk"))


def _hll_finish(registers: DataFrame, key_cols: list[str]) -> DataFrame:
    """Register table (keys..., bucket, m_rank) → (keys..., estimate)."""
    agg = registers.groupBy(*key_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_rank"))).alias("s_present"),
        F.count(F.lit(1)).alias("c_present"),
    )
    raw = F.lit(_HLL_AMM) / (
        F.col("s_present") + (F.lit(_HLL_M) - F.col("c_present")) * F.lit(1.0)
    )
    zeros = F.lit(_HLL_M) - F.col("c_present")
    return agg.select(
        *key_cols,
        F.when(
            (raw <= F.lit(2.5) * _HLL_M) & (zeros > 0),
            F.lit(_HLL_M) * F.log(F.lit(_HLL_M) * F.lit(1.0) / zeros),
        )
        .otherwise(raw)
        .alias("estimate"),
    )


_HLL_HASH_SQL = (
    "CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)
_HLL_RANK_SQL = f"""CASE WHEN hash // {_HLL_M} = 0 THEN {_HLL_RANK_MAX}
         ELSE {_HLL_RANK_MAX} - length(bin(hash // {_HLL_M})) END"""


def _hll_finish_sql(src: str, keys: str) -> str:
    """SQL: register table `src`(keys, bucket, m_rank) → keys, estimate."""
    return f"""
      SELECT {keys},
             CASE WHEN {_HLL_AMM!r} / (s_present + ({_HLL_M} - c_present) * 1e0)
                       <= 2.5e0 * {_HLL_M}
                       AND {_HLL_M} - c_present > 0
                  THEN {_HLL_M} * ln({_HLL_M} * 1e0 / ({_HLL_M} - c_present))
                  ELSE {_HLL_AMM!r} / (s_present + ({_HLL_M} - c_present) * 1e0)
             END AS estimate
      FROM (
        SELECT {keys}, sum(pow(2e0, -m_rank)) AS s_present,
               count(*) AS c_present
        FROM {src} GROUP BY {keys}
      )
    """


@register(
    "hll_daily_to_monthly_rollup",
    oracle=f"""
    WITH h AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             {_HLL_HASH_SQL} AS hash
      FROM events
    ),
    daily AS (
      SELECT event_type, day, hash % {_HLL_M} AS bucket,
             max({_HLL_RANK_SQL}) AS m_rank
      FROM h GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT event_type, bucket, max(m_rank) AS m_rank
      FROM daily GROUP BY 1, 2
    ),
    direct AS (
      SELECT event_type, hash % {_HLL_M} AS bucket,
             max({_HLL_RANK_SQL}) AS m_rank
      FROM h GROUP BY 1, 2
    ),
    em AS ({_hll_finish_sql("merged", "event_type")}),
    ed AS ({_hll_finish_sql("direct", "event_type")}),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1
    )
    SELECT em.event_type,
           CAST((SELECT count(DISTINCT day) FROM daily d
                 WHERE d.event_type = em.event_type) AS BIGINT) AS n_days,
           ROUND(em.estimate, 2) AS est_merged,
           ROUND(ed.estimate, 2) AS est_direct,
           CAST(CASE WHEN em.estimate = ed.estimate THEN 1 ELSE 0 END
                AS BIGINT) AS merge_lossless,
           CAST(ex.n_exact AS BIGINT) AS n_exact,
           ROUND(abs(em.estimate - ex.n_exact) / ex.n_exact, 4) AS rel_err
    FROM em JOIN ed ON em.event_type = ed.event_type
            JOIN ex ON em.event_type = ex.event_type
    """,
)
def hll_daily_to_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-mergeability contract, demonstrated end to end: build
    PER-DAY HLL register tables (what an incremental pipeline persists
    as its gold-table state), merge a month of them by register-wise
    MAX, and show the merged estimate is IDENTICAL to the sketch built
    directly over the raw month (merge_lossless = 1 for every type —
    max is associative, so daily partials lose nothing). This is the
    approx-distinct analog of monthly_from_daily_rollup's mergeable-
    partials rule: exact count(DISTINCT) per month must re-shuffle all
    raw ids (distinct does not merge), while HLL rolls up from
    |types|x|days|x256 tiny persisted rows — the difference between
    re-scanning a month of 100 TB and aggregating kilobytes. Also
    reports the realized error vs the exact distinct. All arithmetic
    shared with hll_distinct_users; both engines regenerate the
    identical registers."""
    ev = load_table(spark, sf_dir, "events")
    obs = _hll_bucket_rank(
        ev.select(
            "event_type",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
            "user_id",
        ),
        ["event_type", "day"],
        "user_id",
    )
    daily = obs.groupBy("event_type", "day", "bucket").agg(
        F.max("rk").alias("m_rank")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("m_rank").alias("m_rank")
    )
    direct = obs.groupBy("event_type", "bucket").agg(F.max("rk").alias("m_rank"))
    em = _hll_finish(merged, ["event_type"]).withColumnRenamed(
        "estimate", "est_m"
    )
    ed = _hll_finish(direct, ["event_type"]).withColumnRenamed(
        "estimate", "est_d"
    )
    ndays = daily.groupBy("event_type").agg(
        F.countDistinct("day").alias("n_days")
    )
    ex = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        em.join(ed, "event_type")
        .join(ndays, "event_type")
        .join(ex, "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.round("est_m", 2).alias("est_merged"),
            F.round("est_d", 2).alias("est_direct"),
            F.when(F.col("est_m") == F.col("est_d"), 1)
            .otherwise(0)
            .cast("long")
            .alias("merge_lossless"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(
                F.abs(F.col("est_m") - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
    )


_HLL_ROLL_DAYS = 7


@register(
    "hll_rolling_7d_distinct",
    oracle=f"""
    WITH h AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_num,
             {_HLL_HASH_SQL} AS hash
      FROM events
    ),
    daily AS (
      SELECT day, day_num, hash % {_HLL_M} AS bucket,
             max({_HLL_RANK_SQL}) AS m_rank
      FROM h GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT d.day, d.day_num, b.bucket
      FROM (SELECT DISTINCT day, day_num FROM daily) d
      CROSS JOIN (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS bucket) b
    ),
    dense AS (
      SELECT g.day, g.day_num, g.bucket, daily.m_rank
      FROM grid g LEFT JOIN daily USING (day, day_num, bucket)
    ),
    rolled AS (
      SELECT day, bucket,
             max(m_rank) OVER (PARTITION BY bucket ORDER BY day_num
                               RANGE BETWEEN {_HLL_ROLL_DAYS - 1} PRECEDING
                               AND CURRENT ROW) AS m_rank
      FROM dense
    ),
    reg AS (SELECT day, bucket, m_rank FROM rolled WHERE m_rank IS NOT NULL),
    est AS ({_hll_finish_sql("reg", "day")}),
    ex AS (
      SELECT d.day, count(DISTINCT e.user_id) AS n_exact
      FROM (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(ts AS DATE) AS dt FROM events) d
      JOIN events e
        ON CAST(e.ts AS DATE) BETWEEN d.dt - {_HLL_ROLL_DAYS - 1} AND d.dt
      GROUP BY 1
    )
    SELECT est.day, CAST(ex.n_exact AS BIGINT) AS n_exact_7d,
           ROUND(est.estimate, 2) AS hll_estimate_7d,
           ROUND(abs(est.estimate - ex.n_exact) / ex.n_exact, 4) AS rel_err
    FROM est JOIN ex USING (day)
    """,
)
def hll_rolling_7d_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day — the DAU/WAU machinery,
    and the canonical HLL deployment: exact rolling distinct needs a
    self-join of every day against its trailing week of raw events
    (here computed anyway as the diagnostic column), while the sketch
    path NEVER revisits raw data — per-day register tables merge into
    trailing-window registers with one max-over-RANGE window on the
    dense (bucket x day) grid ({_HLL_M} x |days| tiny rows). The grid
    densification matters: a register silent TODAY but hit 3 days ago
    must still contribute to today's window, so the window runs over
    the spine, not just observed (bucket, day) rows. Estimates finish
    with the shared _hll_finish; the oracle regenerates everything;
    leading days simply have shorter windows (same on both engines)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
        "user_id",
    )
    obs = _hll_bucket_rank(base, ["day", "day_num"], "user_id")
    daily = obs.groupBy("day", "day_num", "bucket").agg(
        F.max("rk").alias("m_rank")
    )
    days = daily.select("day", "day_num").distinct()
    grid = days.crossJoin(
        F.broadcast(
            days.sparkSession.range(1).select(
                F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias("bucket")
            )
        )
    )
    dense = grid.join(daily, ["day", "day_num", "bucket"], "left")
    w = (
        Window.partitionBy("bucket")
        .orderBy("day_num")
        .rangeBetween(-(_HLL_ROLL_DAYS - 1), 0)
    )
    rolled = dense.select(
        "day", "bucket", F.max("m_rank").over(w).alias("m_rank")
    ).filter(F.col("m_rank").isNotNull())
    est = _hll_finish(rolled, ["day"])
    dt = days.select(
        "day", F.to_date("day", "yyyy-MM-dd").alias("dt")
    )
    ex = (
        dt.join(
            ev.select(F.to_date("ts").alias("edt"), "user_id"),
            (F.col("edt") >= F.date_sub(F.col("dt"), _HLL_ROLL_DAYS - 1))
            & (F.col("edt") <= F.col("dt")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return est.join(ex, "day").select(
        "day",
        F.col("n_exact").cast("long").alias("n_exact_7d"),
        F.round("estimate", 2).alias("hll_estimate_7d"),
        F.round(
            F.abs(F.col("estimate") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


_PATH_TOPK = 10


@register(
    "event_path_top3",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    p AS (
      SELECT event_type || '>' || t1 || '>' || t2 AS path, count(*) AS n
      FROM o WHERE t1 IS NOT NULL AND t2 IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT path, n, row_number() OVER (ORDER BY n DESC, path ASC) AS rank
      FROM p
    )
    SELECT path, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= {_PATH_TOPK}
    """,
)
def event_path_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the corpus's most frequent 3-step
    event-type journeys (view>click>purchase and friends), the
    click-stream analysis behind funnel discovery — where
    conversion_funnel_3step VERIFIES one known path, this FINDS the
    paths worth verifying. Physical shape: per-user lead() windows
    (user_id is a fine-grained, evenly distributed key — the safe kind
    of window partitioning, unlike the low-cardinality per-type sorts
    the binned drift queries retired), then a map-side-combined path
    count whose output is bounded by |types|^3, and
    TakeOrderedAndProject for the top-{_PATH_TOPK} with rank attached
    after the limit. Integer counts, (n desc, path asc) total order —
    engine-exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    p = o.groupBy(
        F.concat_ws(">", "event_type", "t1", "t2").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    top = p.orderBy(F.desc("n"), F.asc("path")).limit(_PATH_TOPK)
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return top.select(
        "path",
        F.col("n").cast("long").alias("n"),
        F.row_number().over(wr).cast("long").alias("rank"),
    )


@register(
    "cdc_latest_state_tombstones",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS last_op,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           ROUND(value, 6) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_latest_state_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: collapse a change log to
    latest-state-per-key with tombstone semantics — the MERGE pattern
    every lakehouse gold table is built on (Debezium/Delta CDF
    consumers do exactly this): newest change per key wins
    (deterministic (ts, event_id) order), and a key whose newest
    change is a delete marker (here: event_type 'error' standing in
    for the op=DELETE column) yields NO row, not a null row. One
    row_number window per key — the fine-grained-key shape — with the
    rank-1 filter pushed into WindowGroupLimit by Catalyst, so the
    shuffle carries only each key's newest few rows, not the full
    history. The tombstone filter applies AFTER rank-1 selection:
    filtering deletes first would wrongly resurrect the
    second-newest change."""
    # one cdc_merge_frames fold step over the WHOLE log — the same
    # function the streaming twin folds per micro-batch (kappa-style;
    # fold invariance pinned in tests/test_r8_properties.py). Catalyst
    # prunes the state-table ordering columns the projection drops.
    ev = load_table(spark, sf_dir, "events")
    return (
        cdc_merge_frames(None, ev)
        .filter(F.col("last_op") != "error")
        .select("user_id", "last_op", "last_ts", "last_value")
    )


# --- merge-on-read CDC compaction --------------------------------------------

_CDC_CUTOFF = "2024-01-21 00:00:00"  # base = first 20 days, deltas = rest
_CDC_BASE_STAGED: dict[str, str] = {}


def _staged_cdc_base(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the compacted BASE snapshot — latest non-tombstone
    state per key among changes BEFORE the cutoff — to parquet once per
    sf_dir: the stored base file of a merge-on-read table (Iceberg/Hudi
    MOR, Delta + CDF). In production this file set is what the LAST
    compaction wrote; the query reads it back instead of re-collapsing
    pre-cutoff history."""
    if sf_dir in _CDC_BASE_STAGED:
        return _CDC_BASE_STAGED[sf_dir]
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(_CDC_CUTOFF).cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    base = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
            F.round("value", 6).alias("last_value"),
        )
    )
    path = tempfile.mkdtemp(prefix="deps_cdc_base_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    base.write.mode("overwrite").parquet(path)
    _CDC_BASE_STAGED[sf_dir] = path
    return path


register_prestage(_staged_cdc_base)


@register(
    "cdc_merge_on_read_compaction",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS last_op,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           ROUND(value, 6) AS last_value,
           CASE WHEN ts >= TIMESTAMP '{_CDC_CUTOFF}'
                THEN 'delta' ELSE 'base' END AS src
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_merge_on_read_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-on-read compaction (VERDICT r5 item 8) — the table-format
    shape next to cdc_latest_state_tombstones: a merge-on-read table is
    a compacted BASE snapshot (one row per live key, stored parquet —
    _staged_cdc_base) plus a DELTA change log (changes after the last
    compaction). This query IS the compaction job that folds them into
    the next base: latest-per-key window over the DELTA SLICE ONLY
    (the base is already unique per key and every delta outranks every
    base change by time, so newest-wins needs no cross-slice
    comparison), non-tombstone delta winners become rows, base rows
    survive only for keys the delta log never touched (left-anti on
    delta keys), and a key whose newest delta is a tombstone ('error'
    op = DELETE marker) is dropped rather than resurrected from base.

    The correctness invariant IS the oracle: the compacted output must
    equal collapsing the FULL change log from scratch (with src
    provenance = which side the surviving row came from). Cost shape
    at 100 TB: one window over the delta log (days, not history), one
    scan of the base snapshot, an anti-join on delta keys — never a
    window over full history, which is exactly why MOR compaction
    stays cheap as the table ages."""
    from pyspark.sql import Window

    base = (
        spark.read.parquet(_staged_cdc_base(spark, sf_dir))
        .withColumn("src", F.lit("base"))
    )
    ev = load_table(spark, sf_dir, "events")
    deltas = ev.filter(F.col("ts") >= F.lit(_CDC_CUTOFF).cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    dl = deltas.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    delta_rows = dl.filter(F.col("event_type") != "error").select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.round("value", 6).alias("last_value"),
        F.lit("delta").alias("src"),
    )
    delta_keys = deltas.select("user_id").distinct()
    surviving_base = base.join(delta_keys, "user_id", "left_anti")
    return delta_rows.unionByName(surviving_base)


# --- STREAMING CDC upsert (foreachBatch MERGE into a keyed gold table) -------

_CDC_STREAM_RESULT: dict[str, str] = {}


def _cdc_state_schema(batch_ev: DataFrame):
    """Schema of the CDC state table: the change projection cdc_merge_frames
    builds from a raw events frame."""
    return _cdc_delta(batch_ev).schema


def _cdc_delta(batch_ev: DataFrame) -> DataFrame:
    return batch_ev.select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.round("value", 6).alias("last_value"),
        "ts",
        "event_id",
        "value",
    )


def cdc_merge_frames(state: DataFrame | None, batch_ev: DataFrame) -> DataFrame:
    """ONE MERGE step of the streaming CDC upsert: fold a raw change
    slice into the current state table — newest (ts, event_id) per key
    wins; tombstone rows are RETAINED (their ordering keys are what
    keeps the fold ASSOCIATIVE: an out-of-order older change arriving
    in a later slice compares against the tombstone and loses instead
    of resurrecting the key). Associativity — fold over ANY partition
    of the change log, in ANY slice order, equals the one-shot collapse
    — is pinned by tests/test_r8_properties.py."""
    from pyspark.sql import Window

    delta = _cdc_delta(batch_ev)
    cur = delta if state is None else state.unionByName(delta)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        cur.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "streaming_cdc_scd1_upsert",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS last_op,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           ROUND(value, 6) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def streaming_cdc_scd1_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `cdc_latest_state_tombstones` — CDC family
    batch/streaming symmetry, the same shape the dedup family got from
    `streaming_dedup_incremental_minhash`: the change log arrives as a
    file-drop STREAM (streaming_q._staged_events: 3 chronological
    slices, maxFilesPerTrigger=1 + availableNow) and foreachBatch runs
    the lakehouse MERGE loop each micro-batch — union the incoming
    changes with the current state table, newest change per key wins
    ((ts, event_id) order), write the merged snapshot as the next
    state VERSION (write-new-read-old, the copy-on-write commit every
    table format uses so readers never see a half-written table).

    Tombstones ('error' op = DELETE marker) are RETAINED in state and
    filtered only at read-back: keeping the tombstone's ordering keys
    in the table is what makes the merge associative — an out-of-order
    older change arriving in a later micro-batch compares against the
    tombstone's (ts, event_id) and loses, instead of resurrecting the
    key (the delete-vector pattern; compaction would drop them the way
    cdc_merge_on_read_compaction does).

    Because the retained-tombstone merge is associative, the final
    state equals the batch collapse regardless of micro-batch
    boundaries — so this gets the batch twin's full value-hash oracle,
    not a rows-only exemption.

    At 100 TB: state is partitioned by key range (each MERGE shuffles
    only the micro-batch + touched state partitions under AQE), the
    per-trigger cost is O(micro-batch + state), and restart replays
    from the checkpoint against the last committed state version."""
    if sf_dir in _CDC_STREAM_RESULT:
        return spark.read.parquet(_CDC_STREAM_RESULT[sf_dir]).filter(
            F.col("last_op") != "error"
        ).drop("ts", "event_id", "value")
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import Window

    from dataengineeringproject_spark.queries.streaming_q import _staged_events

    land = _staged_events(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    state_root = tempfile.mkdtemp(prefix="deps_cdc_stream_state_")
    ckpt = tempfile.mkdtemp(prefix="deps_cdc_stream_ckpt_")
    for p in (state_root, ckpt):
        atexit.register(shutil.rmtree, p, ignore_errors=True)
    state: dict[str, str | None] = {"path": None}

    def _merge(batch_ev: DataFrame, batch_id: int) -> None:
        prev = (
            None
            if state["path"] is None
            else spark.read.schema(_cdc_state_schema(batch_ev)).parquet(
                state["path"]
            )
        )
        merged = cdc_merge_frames(prev, batch_ev)
        new_path = f"{state_root}/v{batch_id}"
        merged.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path
        # retention runs as part of the commit loop: storage stays
        # bounded at 2 snapshots (current + one grace copy for
        # in-flight readers) instead of growing by one per trigger
        from dataengineeringproject_spark.sources.layout import (
            vacuum_versions,
        )

        vacuum_versions(state_root, keep=2, current=new_path)

    from dataengineeringproject_spark.queries.streaming_q import (
        _pinned_shuffle_partitions,
    )

    with _pinned_shuffle_partitions(spark, 8):
        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
            .writeStream.foreachBatch(_merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert state["path"] is not None
    _CDC_STREAM_RESULT[sf_dir] = state["path"]
    return spark.read.parquet(state["path"]).filter(
        F.col("last_op") != "error"
    ).drop("ts", "event_id", "value")


_QB_QS = [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)]


_ORACLE_VQB = f"""
    WITH s AS (
      SELECT min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type, {_FINE_BIN_SQL} AS bin,
             count(*) AS cnt, max(e.value) AS bhi
      FROM events e CROSS JOIN s
      WHERE e.value IS NOT NULL
      GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, bin, bhi,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS tot
      FROM g
    ),
    q AS (SELECT unnest([{", ".join(str(q) for _, q in _QB_QS)}]) AS q,
                 unnest([{", ".join(f"'{n}'" for n, _ in _QB_QS)}]) AS qname),
    hit AS (
      SELECT c.event_type, q.qname,
             min(c.bin) AS qbin
      FROM c CROSS JOIN q
      WHERE c.cum >= q.q * c.tot
      GROUP BY 1, 2
    )
    SELECT hit.event_type,
           {", ".join(
               f"ROUND(max(CASE WHEN qname = '{n}' THEN bhi END), 6) AS {n}"
               for n, _ in _QB_QS
           )}
    FROM hit JOIN c ON c.event_type = hit.event_type AND c.bin = hit.qbin
    GROUP BY 1
    """


@register("value_quantiles_binned", oracle=_ORACLE_VQB)
def value_quantiles_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-group quantiles from the shared fixed fine grid —
    the registered scale twin value_quantiles' docstring promises: the
    exact variant buffers each group's full value set (fine per bounded
    key, unbounded at a 100 TB global profile), while this reads each
    quantile off the 1024-bin histogram — one map-side-combined
    aggregate over raw data, everything after runs on |types| x 1024
    rows. The estimate is the max observed value in the first bin whose
    cumulative count crosses q x total (error bounded by bin width,
    ~0.1% of the value range), and DETERMINISTIC — unlike t-digest
    approx_percentile, whose sketch DuckDB cannot replicate, this
    approximation is bit-identical in both engines and fully
    hash-checked. Same grid/arithmetic as histogram_equidepth_approx."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    g = (
        ev.crossJoin(F.broadcast(s))
        .select("event_type", _fine_bin(F.col("value")).alias("bin"), "value")
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("value").alias("bhi"))
    )
    return _binned_quantiles_report(g)


def _binned_quantiles_report(g: DataFrame) -> DataFrame:
    """Quantile read-back over a converged (event_type, bin, cnt, bhi)
    histogram — ONE finisher shared by the batch query and the
    streaming twin (the monitor-family pattern: the sketch/summary is
    maintained incrementally, the report is a batch read of it).
    Everything here runs on |types| × 1024 rows."""
    from pyspark.sql import Window

    wp = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        "bin",
        "bhi",
        F.sum("cnt")
        .over(wp.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("cnt").over(wp).alias("tot"),
    )
    qtab = local_df(
        g.sparkSession, [(n, q) for n, q in _QB_QS], "qname string, q double"
    )
    hit = (
        c.crossJoin(F.broadcast(qtab))
        .filter(F.col("cum") >= F.col("q") * F.col("tot"))
        .groupBy("event_type", "qname")
        .agg(F.min("bin").alias("qbin"))
    )
    joined = hit.join(
        c.select("event_type", F.col("bin").alias("qbin"), "bhi"),
        ["event_type", "qbin"],
    )
    return joined.groupBy("event_type").agg(
        *[
            F.round(
                F.max(F.when(F.col("qname") == n, F.col("bhi"))), 6
            ).alias(n)
            for n, _ in _QB_QS
        ]
    )


# --- STREAMING binned quantiles (completes sketch-family symmetry) -----------


@register(
    "streaming_value_quantiles_binned",
    oracle=_ORACLE_VQB,
)
def streaming_value_quantiles_binned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of value_quantiles_binned — completes the
    mergeable-summary streaming set (HLL distinct, CMS heavy hitters,
    Bloom dedup, now binned quantiles): the 1024-bin grid is calibrated
    ONCE on history (min/max from the static table — the fixed-bounds
    contract every production latency/value histogram uses; a
    data-dependent grid would shift under the stream), each micro-batch
    folds its rows into per-(type, bin) count/max partials via a NATIVE
    streaming aggregation (state bounded at |types| × 1024 rows
    forever), and the quantile report is the SAME read-back finisher
    (_binned_quantiles_report) the batch query uses — summaries are
    maintained incrementally, reports are batch reads. Converged
    complete-mode state equals the batch histogram exactly (count and
    max are order-insensitive), so this carries the batch twin's full
    value-hash oracle."""
    from dataengineeringproject_spark.queries.streaming_q import (
        _pinned_shuffle_partitions,
        _RUN_ID,
        _staged_events,
    )
    from dataengineeringproject_spark.streaming.daily import run_to_memory

    ev = load_table(spark, sf_dir, "events")
    land = _staged_events(spark, sf_dir)
    s = (
        ev.filter(F.col("value").isNotNull())
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        .withColumn("__one", F.lit(1))
    )
    name = f"vqb_stream_q_{next(_RUN_ID)}"
    with _pinned_shuffle_partitions(spark, 8):
        src = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
            .filter(F.col("value").isNotNull())
            .withColumn("__one", F.lit(1))
            .join(F.broadcast(s), "__one")
        )
        g = (
            src.select(
                "event_type", _fine_bin(F.col("value")).alias("bin"), "value"
            )
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"), F.max("value").alias("bhi"))
        )
        run_to_memory(g, name, output_mode="complete")
    # eager localCheckpoint of the |types|×1024-row snapshot: the
    # finisher references it twice, and memory-sink views re-resolve
    # to identical attribute ids (self-join conflict) without it
    return _binned_quantiles_report(spark.table(name).localCheckpoint())


# --- HLL set algebra (r5): intersection via inclusion-exclusion -------------
# The union of two HLLs is exact sketch algebra (register-wise max —
# the merge the rollup query already proves); intersection has no
# native sketch operation, so the standard estimator is
# inclusion-exclusion over three estimates: |A∩B| ≈ |A| + |B| - |A∪B|.
# Its error compounds (known caveat: variance grows as the true
# intersection shrinks relative to the union), so the query reports
# the exact intersection and realized relative error alongside.

_HLL_PAIRS = [("click", "purchase"), ("view", "signup"), ("click", "view")]


@register(
    "hll_intersection_estimate",
    oracle=f"""
    WITH h AS (
      SELECT event_type, user_id, {_HLL_HASH_SQL} AS hash
      FROM events
    ),
    reg AS (
      SELECT event_type, hash % {_HLL_M} AS bucket,
             max({_HLL_RANK_SQL}) AS m_rank
      FROM h GROUP BY 1, 2
    ),
    pairs(ta, tb) AS (VALUES {", ".join(f"('{a}', '{b}')" for a, b in _HLL_PAIRS)}),
    ra AS (SELECT p.ta, p.tb, r.bucket, r.m_rank
           FROM pairs p JOIN reg r ON r.event_type = p.ta),
    rb AS (SELECT p.ta, p.tb, r.bucket, r.m_rank
           FROM pairs p JOIN reg r ON r.event_type = p.tb),
    ru AS (
      SELECT coalesce(ra.ta, rb.ta) AS ta, coalesce(ra.tb, rb.tb) AS tb,
             coalesce(ra.bucket, rb.bucket) AS bucket,
             greatest(coalesce(ra.m_rank, 0), coalesce(rb.m_rank, 0)) AS m_rank
      FROM ra FULL OUTER JOIN rb
        ON ra.ta = rb.ta AND ra.tb = rb.tb AND ra.bucket = rb.bucket
    ),
    ea AS ({_hll_finish_sql("ra", "ta, tb")}),
    eb AS ({_hll_finish_sql("rb", "ta, tb")}),
    eu AS ({_hll_finish_sql("ru", "ta, tb")}),
    ex AS (
      SELECT p.ta, p.tb, count(*) AS n_exact FROM pairs p
      JOIN (SELECT DISTINCT event_type, user_id FROM events) ua
        ON ua.event_type = p.ta
      JOIN (SELECT DISTINCT event_type, user_id FROM events) ub
        ON ub.event_type = p.tb AND ub.user_id = ua.user_id
      GROUP BY 1, 2
    )
    SELECT ea.ta, ea.tb,
           ROUND(ea.estimate, 2) AS est_a,
           ROUND(eb.estimate, 2) AS est_b,
           ROUND(eu.estimate, 2) AS est_union,
           ROUND(ea.estimate + eb.estimate - eu.estimate, 2)
             AS est_intersection,
           CAST(ex.n_exact AS BIGINT) AS n_exact,
           ROUND(abs(ea.estimate + eb.estimate - eu.estimate - ex.n_exact)
                 / ex.n_exact, 4) AS rel_err
    FROM ea JOIN eb USING (ta, tb) JOIN eu USING (ta, tb)
    JOIN ex USING (ta, tb)
    """,
)
def hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra: per event-type pair, estimate |A|, |B|, |A∪B|
    (union = register-wise MAX — exact sketch algebra, the merge
    hll_daily_to_monthly_rollup proves) and derive |A∩B| by
    inclusion-exclusion, against the exact intersection and its
    realized relative error. Why it earns a slot: at 100 TB, overlap
    questions ("how many users both clicked and purchased", "how many
    docs appear in both crawls") are exact-join questions costing a
    corpus-wide shuffle each — three 256-register sketches answer
    them in one pass, mergeable across shards/days, with this query
    measuring exactly the estimator's known weakness (error compounds
    as the true overlap shrinks). Registers are the engine-
    deterministic md5 family; every estimate is hash-checked."""
    ev = load_table(spark, sf_dir, "events")
    obs = _hll_bucket_rank(
        ev.select("event_type", "user_id"), ["event_type"], "user_id"
    )
    reg = obs.groupBy("event_type", "bucket").agg(F.max("rk").alias("m_rank"))
    pairs = local_df(spark, _HLL_PAIRS, "ta string, tb string")
    ra = pairs.join(
        reg, reg["event_type"] == pairs["ta"]
    ).select("ta", "tb", "bucket", "m_rank")
    rb = pairs.join(
        reg, reg["event_type"] == pairs["tb"]
    ).select("ta", "tb", "bucket", "m_rank")
    ru = (
        ra.withColumnRenamed("m_rank", "mra")
        .join(
            rb.withColumnRenamed("m_rank", "mrb"),
            ["ta", "tb", "bucket"],
            "full_outer",
        )
        .select(
            "ta",
            "tb",
            "bucket",
            F.greatest(
                F.coalesce("mra", F.lit(0)), F.coalesce("mrb", F.lit(0))
            ).alias("m_rank"),
        )
    )
    ea = _hll_finish(ra, ["ta", "tb"]).withColumnRenamed("estimate", "e_a")
    eb = _hll_finish(rb, ["ta", "tb"]).withColumnRenamed("estimate", "e_b")
    eu = _hll_finish(ru, ["ta", "tb"]).withColumnRenamed("estimate", "e_u")
    users = ev.select("event_type", "user_id").distinct()
    ex = (
        pairs.join(users.alias("ua"), F.col("ua.event_type") == F.col("ta"))
        .join(
            users.alias("ub"),
            (F.col("ub.event_type") == F.col("tb"))
            & (F.col("ub.user_id") == F.col("ua.user_id")),
        )
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    inter = F.col("e_a") + F.col("e_b") - F.col("e_u")
    return (
        ea.join(eb, ["ta", "tb"])
        .join(eu, ["ta", "tb"])
        .join(ex, ["ta", "tb"])
        .select(
            "ta",
            "tb",
            F.round("e_a", 2).alias("est_a"),
            F.round("e_b", 2).alias("est_b"),
            F.round("e_u", 2).alias("est_union"),
            F.round(inter, 2).alias("est_intersection"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(F.abs(inter - F.col("n_exact")) / F.col("n_exact"), 4).alias(
                "rel_err"
            ),
        )
    )


# --- mergeable binned quantiles (r5): day-shard rollup ----------------------


@register(
    "quantiles_binned_rollup",
    oracle=f"""
    WITH s AS (
      SELECT min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT event_type, strftime(e.ts, '%Y-%m-%d') AS day,
             {_FINE_BIN_SQL} AS bin,
             count(*) AS cnt, max(e.value) AS bhi
      FROM events e CROSS JOIN s
      WHERE e.value IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT event_type, bin, sum(cnt) AS cnt, max(bhi) AS bhi
      FROM daily GROUP BY 1, 2
    ),
    direct AS (
      SELECT event_type, {_FINE_BIN_SQL} AS bin,
             count(*) AS cnt, max(e.value) AS bhi
      FROM events e CROSS JOIN s
      WHERE e.value IS NOT NULL
      GROUP BY 1, 2
    ),
    q AS (SELECT unnest([{", ".join(str(q) for _, q in _QB_QS)}]) AS q,
                 unnest([{", ".join(f"'{n}'" for n, _ in _QB_QS)}]) AS qname),
    cm AS (
      SELECT event_type, bin, bhi,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS tot
      FROM merged
    ),
    cd AS (
      SELECT event_type, bin, bhi,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS tot
      FROM direct
    ),
    hm AS (
      SELECT cm.event_type, q.qname, min(cm.bin) AS qbin
      FROM cm CROSS JOIN q WHERE cm.cum >= q.q * cm.tot GROUP BY 1, 2
    ),
    hd AS (
      SELECT cd.event_type, q.qname, min(cd.bin) AS qbin
      FROM cd CROSS JOIN q WHERE cd.cum >= q.q * cd.tot GROUP BY 1, 2
    ),
    vm AS (
      SELECT hm.event_type, hm.qname, ROUND(cm.bhi, 6) AS q_merged
      FROM hm JOIN cm ON cm.event_type = hm.event_type AND cm.bin = hm.qbin
    ),
    vd AS (
      SELECT hd.event_type, hd.qname, ROUND(cd.bhi, 6) AS q_direct
      FROM hd JOIN cd ON cd.event_type = hd.event_type AND cd.bin = hd.qbin
    )
    SELECT vm.event_type, vm.qname, vm.q_merged, vd.q_direct,
           vm.q_merged = vd.q_direct AS equal
    FROM vm JOIN vd USING (event_type, qname)
    """,
)
def quantiles_binned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABILITY proof for the binned-quantile family, the property
    that makes it deployable where exact quantiles are not: per-day
    (event_type, day, bin) histograms merge to per-type histograms by
    plain cnt-sum / bhi-max — bin counts are LINEAR, so shard-wise
    sketches combine associatively and LOSSLESSLY — and the quantiles
    read off the merged histogram equal the direct whole-corpus
    computation EXACTLY (the `equal` column asserts it per quantile,
    engine-checked on both sides). This is the same merge class as
    CMS (add) and the reason a 100 TB profile runs as one map-side-
    combined pass per shard/day plus a tiny rollup, while exact
    quantiles would re-sort the corpus per regrouping. Grid and
    read-off arithmetic are value_quantiles_binned's (shared fine
    grid, first bin crossing q x total)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    binned = ev.crossJoin(F.broadcast(s)).select(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        _fine_bin(F.col("value")).alias("bin"),
        "value",
    )
    daily = binned.groupBy("event_type", "day", "bin").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("value").alias("bhi")
    )
    merged = daily.groupBy("event_type", "bin").agg(
        F.sum("cnt").alias("cnt"), F.max("bhi").alias("bhi")
    )
    direct = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("value").alias("bhi")
    )
    qtab = local_df(
        spark, [(n, q) for n, q in _QB_QS], "qname string, q double"
    )

    def read_quantiles(g: DataFrame, out: str) -> DataFrame:
        wp = Window.partitionBy("event_type")
        c = g.select(
            "event_type",
            "bin",
            "bhi",
            F.sum("cnt")
            .over(
                wp.orderBy("bin").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("cum"),
            F.sum("cnt").over(wp).alias("tot"),
        )
        hit = (
            c.crossJoin(F.broadcast(qtab))
            .filter(F.col("cum") >= F.col("q") * F.col("tot"))
            .groupBy("event_type", "qname")
            .agg(F.min("bin").alias("qbin"))
        )
        return hit.join(
            c.select("event_type", F.col("bin").alias("qbin"), "bhi"),
            ["event_type", "qbin"],
        ).select("event_type", "qname", F.round("bhi", 6).alias(out))

    vm = read_quantiles(merged, "q_merged")
    vd = read_quantiles(direct, "q_direct")
    return vm.join(vd, ["event_type", "qname"]).select(
        "event_type",
        "qname",
        "q_merged",
        "q_direct",
        (F.col("q_merged") == F.col("q_direct")).alias("equal"),
    )


# --- table profiling (r5): the data-quality pass every pipeline runs --------
# One scan of `events` producing a per-column scorecard: row count,
# null count/fraction, deterministic HLL distinct estimate, numeric
# min/max. The per-column value is canonicalized to a string FORM THE
# TWO ENGINES AGREE ON before hashing (longs/strings as-is, timestamps
# via explicit format, doubles via C-style %.6f — a bare double→string
# cast diverges between Java and DuckDB formatting, which would change
# the registers), so even the approximate distinct is value-hash-checked.

_PROFILE_COLS = [
    # (name, canonical-string spark expr template, numeric?)
    ("event_id", "CAST(event_id AS STRING)", True),
    ("user_id", "CAST(user_id AS STRING)", True),
    ("event_type", "event_type", False),
    # NULL-guarded: Spark's format_string renders NULL as the literal
    # string 'null' (unlike DuckDB printf, which returns NULL), which
    # would silently zero the null accounting for the float column
    ("value",
     "CASE WHEN value IS NULL THEN CAST(NULL AS STRING) "
     "ELSE format_string('%.6f', value) END", True),
    ("props", "props", False),
]


def _profile_oracle() -> str:
    duck_canon = {
        "event_id": "CAST(event_id AS VARCHAR)",
        "user_id": "CAST(user_id AS VARCHAR)",
        "event_type": "event_type",
        "value": "printf('%.6f', value)",
        "props": "props",
    }
    stacked = " UNION ALL ".join(
        f"SELECT '{name}' AS col_name, {duck_canon[name]} AS val, "
        + (
            f"CAST({name} AS DOUBLE) AS num"
            if numeric
            else "CAST(NULL AS DOUBLE) AS num"
        )
        + " FROM events"
        for name, _, numeric in _PROFILE_COLS
    )
    return f"""
    WITH stacked AS ({stacked}),
    h AS (
      SELECT col_name, num,
             CASE WHEN val IS NULL THEN NULL
                  ELSE CAST(concat('0x', substr(md5(val), 1, 15)) AS BIGINT)
             END AS hash
      FROM stacked
    ),
    g1 AS (
      SELECT col_name,
             coalesce(hash % {_HLL_M}, -1) AS bucket,
             count(*) AS cnt,
             min(num) AS mn, max(num) AS mx,
             max({_HLL_RANK_SQL}) AS m_rank
      FROM h GROUP BY 1, 2
    ),
    base AS (
      SELECT col_name, sum(cnt) AS n_rows,
             sum(CASE WHEN bucket = -1 THEN cnt ELSE 0 END) AS n_null,
             ROUND(min(mn), 6) AS min_num, ROUND(max(mx), 6) AS max_num
      FROM g1 GROUP BY 1
    ),
    reg AS (SELECT col_name, bucket, m_rank FROM g1 WHERE bucket >= 0),
    est AS ({_hll_finish_sql("reg", "col_name")})
    SELECT base.col_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_null AS BIGINT) AS n_null,
           ROUND(n_null * 1e0 / n_rows, 6) AS null_frac,
           ROUND(est.estimate, 2) AS distinct_est,
           min_num, max_num
    FROM base JOIN est USING (col_name)
    """


@register("profile_table", oracle=_profile_oracle())
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide profiling in ONE corpus pass — the expectations/
    data-quality scan every training-data pipeline runs before and
    after each transform: per column, row count, null count and
    fraction, an approximate distinct-value count, and numeric
    min/max. Physical shape for 100 TB: the row fans out to one
    (col_name, canonical_val, num) tuple per profiled column map-side
    (no extra scan per column — the naive per-column profile costs
    |cols| scans and |cols| exact-distinct shuffles), and everything
    aggregates map-side-combined: counts and min/max directly, the
    distinct estimate through the engine's deterministic 256-register
    HLL (mergeable across shards, bounded state — the profile of a
    sharded corpus rolls up losslessly). Distinct estimates hash the
    CANONICAL string form (see _PROFILE_COLS: %.6f for doubles —
    engine-identical formatting), so the whole profile, approximation
    included, is value-hash-checked against DuckDB."""
    ev = load_table(spark, sf_dir, "events")
    stacked = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col_name"),
                        F.expr(canon).alias("val"),
                        (
                            F.col(name).cast("double")
                            if numeric
                            else F.lit(None).cast("double")
                        ).alias("num"),
                    )
                    for name, canon, numeric in _PROFILE_COLS
                ]
            )
        ).alias("x")
    ).select("x.*")
    # ONE pass, ONE shuffle: nulls ride along as bucket -1, so the
    # per-(col, bucket) aggregate simultaneously builds the HLL
    # registers AND the partial counts/min/max that re-aggregate to
    # the per-column scorecard (two groupBys over the fanout would
    # scan the corpus twice — the plan test pins the single scan).
    h = F.conv(F.substring(F.md5(F.col("val")), 1, 15), 16, 10).cast("long")
    w = F.expr(f"__h div {_HLL_M}")
    rk = F.when(w == 0, F.lit(_HLL_RANK_MAX)).otherwise(
        F.lit(_HLL_RANK_MAX) - F.length(F.bin(w))
    )
    obs = stacked.select(
        "col_name", "num", h.alias("__h")
    ).select(
        "col_name",
        "num",
        F.coalesce(F.col("__h") % _HLL_M, F.lit(-1)).alias("bucket"),
        rk.alias("rk"),
    )
    # cached: Catalyst does not share subtrees, so without it the two
    # consumers below (scorecard re-aggregate + HLL finish) would each
    # re-run the corpus scan; the cached frame is |cols| x 257 rows.
    g1 = obs.groupBy("col_name", "bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("num").alias("mn"),
        F.max("num").alias("mx"),
        F.max("rk").alias("m_rank"),
    ).cache()
    base = g1.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(
            F.when(F.col("bucket") == -1, F.col("cnt")).otherwise(0)
        ).alias("n_null"),
        F.round(F.min("mn"), 6).alias("min_num"),
        F.round(F.max("mx"), 6).alias("max_num"),
    )
    est = _hll_finish(
        g1.filter(F.col("bucket") >= 0).select("col_name", "bucket", "m_rank"),
        ["col_name"],
    )
    return base.join(est, "col_name").select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.round(F.col("n_null") * F.lit(1.0) / F.col("n_rows"), 6).alias(
            "null_frac"
        ),
        F.round("estimate", 2).alias("distinct_est"),
        "min_num",
        "max_num",
    )


# --- PageRank (r5): iterative linear algebra kept in the plan ---------------
# Third member of the in-plan iterative family (Lloyd k-means trains
# the IVF index, the BPE trainer loops count→merge→apply): k unrolled
# power iterations over an edge frame, no driver collect. The graph is
# the event-type transition graph (consecutive events per user),
# weighted by transition count.

_PR_D = 0.85      # damping
_PR_ITERS = 5


def _pagerank_oracle(k: int) -> str:
    sql = f"""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    edges AS (
      SELECT event_type AS src, nxt AS dst, count(*) AS w
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    outd AS (SELECT src, sum(w) AS outw FROM edges GROUP BY 1),
    e AS (
      SELECT edges.src, edges.dst, edges.w * 1e0 / outd.outw AS p
      FROM edges JOIN outd USING (src)
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    n AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1e0 / n.n AS r FROM nodes, n)"""
    for i in range(1, k + 1):
        sql += f""",
    r{i} AS (
      SELECT nodes.node,
             ROUND((1e0 - {_PR_D}e0) / n.n
                   + {_PR_D}e0 * coalesce(m.mass, 0e0), 6) AS r
      FROM nodes CROSS JOIN n
      LEFT JOIN (
        SELECT e.dst AS node, sum(r{i - 1}.r * e.p) AS mass
        FROM e JOIN r{i - 1} ON r{i - 1}.node = e.src
        GROUP BY 1
      ) m USING (node)
    )"""
    sql += f"""
    SELECT node, r AS pagerank,
           CAST(row_number() OVER (ORDER BY r DESC, node) AS BIGINT) AS rnk
    FROM r{k}
    """
    return sql


@register("pagerank_event_graph", oracle=_pagerank_oracle(_PR_ITERS))
def pagerank_event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph: {_PR_ITERS}
    unrolled power iterations of r ← (1-d)/N + d·Σ r(u)·w(u,v)/out(u),
    d = {_PR_D}, per-iteration values rounded to 6dp (the same
    round-stabilization Lloyd's means use, so engine float ulps can't
    compound across iterations). One corpus pass builds the weighted
    edge frame (per-user lead() window — event_path_top3's documented
    safe shape); every iteration after that is a join + map-side-
    combined sum on the EDGE frame, shuffled by dst — on a 100 TB
    graph that is the canonical BSP iteration (rank vector partitioned
    with the edges, never collected; checkpoint every few iterations
    to truncate lineage). Nodes with no in-edges keep the (1-d)/N
    teleport mass via the left join; dangling-node mass is not
    redistributed (none exist in this graph; the textbook correction
    adds one aggregate per iteration)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w_user).alias("nxt")
    )
    edges = (
        o.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outd = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    e = edges.join(outd, "src").select(
        "src", "dst", (F.col("w") * F.lit(1.0) / F.col("outw")).alias("p")
    ).cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    r = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(_PR_ITERS):
        mass = (
            e.join(r, e["src"] == r["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") * F.col("p")).alias("mass"))
        )
        r = (
            nodes.crossJoin(F.broadcast(n))
            .join(mass, "node", "left")
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - _PR_D) / F.col("n")
                    + F.lit(_PR_D) * F.coalesce("mass", F.lit(0.0)),
                    6,
                ).alias("r"),
            )
        )
    wr = Window.orderBy(F.desc("r"), F.asc("node"))
    return r.select(
        "node",
        F.col("r").alias("pagerank"),
        F.row_number().over(wr).cast("long").alias("rnk"),
    )


# --- Jensen-Shannon drift (r5): completes the drift monitor family ----------
# KS (binned CDF distance), PSI (log-ratio, unbounded), chi2
# (categorical mix) exist; JS divergence adds the bounded-symmetric
# member ([0, ln 2], defined even where one side has zero mass without
# smoothing) that drift dashboards threshold when PSI's unboundedness
# is awkward. Same physical shape as the PSI query: one map-side-
# combined (type, bin) count over the 10-bin grid, densified to the
# full grid, everything after on the aggregate-sized frame.


@register(
    "drift_js_binned",
    oracle=f"""
    WITH s AS (
      SELECT min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL
    ),
    t AS (
      SELECT e.event_type,
             {_grid_bin_sql(_PSI_BINS)} AS bin,
             CASE WHEN e.ts < TIMESTAMP '{_DRIFT_PIVOT}' THEN 1 ELSE 0 END
               AS in_a
      FROM events e CROSS JOIN s
      WHERE e.value IS NOT NULL
    ),
    g0 AS (
      SELECT event_type, bin,
             sum(in_a) AS a_cnt, sum(1 - in_a) AS b_cnt
      FROM t GROUP BY 1, 2
    ),
    g AS (
      SELECT grid.event_type, grid.bin,
             coalesce(g0.a_cnt, 0) AS a_cnt, coalesce(g0.b_cnt, 0) AS b_cnt
      FROM (SELECT et.event_type, r.range AS bin
            FROM (SELECT DISTINCT event_type FROM t) et
            CROSS JOIN range({_PSI_BINS}) r) grid
      LEFT JOIN g0
        ON grid.event_type = g0.event_type AND grid.bin = g0.bin
    ),
    c AS (
      SELECT event_type, a_cnt, b_cnt,
             sum(a_cnt) OVER p AS n_a, sum(b_cnt) OVER p AS n_b
      FROM g
      WINDOW p AS (PARTITION BY event_type)
    ),
    pq AS (
      SELECT event_type, n_a, n_b,
             a_cnt * 1e0 / n_a AS p,
             b_cnt * 1e0 / n_b AS q,
             (a_cnt * 1e0 / n_a + b_cnt * 1e0 / n_b) / 2e0 AS m
      FROM c
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(sum(
             (CASE WHEN p > 0e0 THEN p * ln(p / m) / 2e0 ELSE 0e0 END)
             + (CASE WHEN q > 0e0 THEN q * ln(q / m) / 2e0 ELSE 0e0 END)
           ), 6) AS js_div
    FROM pq GROUP BY 1, 2, 3
    """,
)
def drift_js_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence per event_type, first vs second
    half-month, over the shared 10-bin equal-width grid: JS(P,Q) =
    KL(P||M)/2 + KL(Q||M)/2 with M = (P+Q)/2. Bounded in [0, ln 2],
    symmetric, and finite WITHOUT smoothing (a bin empty on one side
    contributes only the other side's term; empty on both contributes
    nothing) — the property that makes it the thresholdable companion
    to PSI's unbounded log-ratio. Physical shape identical to
    drift_psi_value: the only full-data pass is the map-side-combined
    (type, bin) count; densify, window totals, and the divergence sum
    all run on the <= |types| x 10-row frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    t = ev.crossJoin(F.broadcast(s)).select(
        "event_type",
        _grid_bin(F.col("value"), _PSI_BINS).alias("bin"),
        (F.col("ts") < F.lit(_DRIFT_PIVOT).cast("timestamp"))
        .cast("int")
        .alias("in_a"),
    )
    # cached (see psi_finish): grid branch + left join both consume it
    g0 = t.groupBy("event_type", "bin").agg(
        F.sum("in_a").alias("a_cnt"),
        F.sum(1 - F.col("in_a")).alias("b_cnt"),
    ).cache()
    grid = (
        g0.select("event_type")
        .distinct()
        .crossJoin(spark.range(_PSI_BINS).select(F.col("id").alias("bin")))
    )
    g = grid.join(g0, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("a_cnt", F.lit(0)).alias("a_cnt"),
        F.coalesce("b_cnt", F.lit(0)).alias("b_cnt"),
    )
    wp = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        "a_cnt",
        "b_cnt",
        F.sum("a_cnt").over(wp).alias("n_a"),
        F.sum("b_cnt").over(wp).alias("n_b"),
    )
    p = F.col("a_cnt") * F.lit(1.0) / F.col("n_a")
    q = F.col("b_cnt") * F.lit(1.0) / F.col("n_b")
    m = (p + q) / F.lit(2.0)
    pq = c.select(
        "event_type", "n_a", "n_b",
        p.alias("p"), q.alias("q"), m.alias("m"),
    )
    term = (
        F.when(
            F.col("p") > 0.0, F.col("p") * F.log(F.col("p") / F.col("m")) / 2
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("q") > 0.0, F.col("q") * F.log(F.col("q") / F.col("m")) / 2
        ).otherwise(F.lit(0.0))
    )
    return pq.groupBy(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    ).agg(F.round(F.sum(term), 6).alias("js_div"))


# --- snapshot diff + referential-integrity audit (r5 continuation) -----------

_SNAP_CUT = "2024-01-16"  # snapshot A horizon; snapshot B = full history


@register(
    "snapshot_diff_users",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type, value, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_b,
             CASE WHEN ts < TIMESTAMP '{_SNAP_CUT}' THEN
               row_number() OVER (PARTITION BY user_id,
                                  (ts < TIMESTAMP '{_SNAP_CUT}')
                                  ORDER BY ts DESC, event_id DESC)
             END AS rn_a
      FROM events
    ),
    a AS (SELECT user_id, event_type AS old_type, ROUND(value, 6) AS old_value
          FROM ranked WHERE rn_a = 1 AND ts < TIMESTAMP '{_SNAP_CUT}'),
    b AS (SELECT user_id, event_type AS new_type, ROUND(value, 6) AS new_value
          FROM ranked WHERE rn_b = 1)
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           CASE WHEN a.user_id IS NULL THEN 'added'
                WHEN b.user_id IS NULL THEN 'removed'
                WHEN a.old_type <> b.new_type
                     OR a.old_value <> b.new_value THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           a.old_type, a.old_value, b.new_type, b.new_value
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
)
def snapshot_diff_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table diff between two snapshots of per-user latest state (the
    data-eng regression check run between pipeline versions or before
    a backfill ships): snapshot A = state at {_SNAP_CUT}, snapshot B =
    current; every user classified added / removed / changed /
    unchanged with the old and new state side by side. State is the
    latest (event_type, value) by (ts, event_id) — one window pass
    computes BOTH snapshot ranks (the A-rank partitioned by the
    cutoff predicate), then a full outer join keyed user_id compares.
    'removed' is structurally impossible here (B's history contains
    A's) but the classifier carries it for real snapshot pairs. At
    100 TB both snapshot states are |users| rows co-partitioned by the
    join key — the diff never touches raw events twice."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    in_a = F.col("ts") < F.lit(_SNAP_CUT).cast("timestamp")
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wa = Window.partitionBy("user_id", in_a).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = ev.select(
        "user_id", "event_type", "value", "ts", "event_id",
        F.row_number().over(wb).alias("rn_b"),
        F.when(in_a, F.row_number().over(wa)).alias("rn_a"),
    )
    a = ranked.filter((F.col("rn_a") == 1) & in_a).select(
        F.col("user_id").alias("ua"),
        F.col("event_type").alias("old_type"),
        F.round("value", 6).alias("old_value"),
    )
    b = ranked.filter(F.col("rn_b") == 1).select(
        F.col("user_id").alias("ub"),
        F.col("event_type").alias("new_type"),
        F.round("value", 6).alias("new_value"),
    )
    j = a.join(b, F.col("ua") == F.col("ub"), "full_outer")
    return j.select(
        F.coalesce("ua", "ub").alias("user_id"),
        F.when(F.col("ua").isNull(), F.lit("added"))
        .when(F.col("ub").isNull(), F.lit("removed"))
        .when(
            (F.col("old_type") != F.col("new_type"))
            | (F.col("old_value") != F.col("new_value")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        "old_type", "old_value", "new_type", "new_value",
    )


_FK_RELS = [
    # (name, child, child_key, parent, parent_key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def _fk_oracle() -> str:
    parts = []
    for name, child, ck, parent, pk in _FK_RELS:
        parts.append(f"""
    SELECT '{name}' AS relationship,
           (SELECT count(*) FROM {child}) AS n_child,
           (SELECT count(*) FROM {child} c
            WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                              WHERE p.{pk} = c.{ck})) AS n_orphans,
           (SELECT count(*) FROM {parent}) AS n_parents,
           (SELECT count(*) FROM {parent} p
            WHERE NOT EXISTS (SELECT 1 FROM {child} c
                              WHERE c.{ck} = p.{pk})) AS n_childless""")
    body = " UNION ALL ".join(parts)
    return f"""
    SELECT relationship, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           CAST(n_parents AS BIGINT) AS n_parents,
           CAST(n_childless AS BIGINT) AS n_childless
    FROM ({body})
    """


@register("fk_integrity_audit", oracle=_fk_oracle())
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the five star-schema foreign
    keys: per relationship, child rows without a parent (orphans — a
    load-order or CDC-apply bug) and parents without any child
    (childless — expected for slow dimensions, a red flag for fact
    links). One lazy union of five audit frames; each orphan count is
    a LEFT ANTI join on the key (broadcast when the parent side is a
    dimension) and each childless count is the anti join reversed —
    the same semi/anti machinery the engine's joins already prove,
    pointed at pipeline health. At 100 TB the anti joins shuffle on
    the key like the fact-dimension joins they audit; AQE turns the
    small-dimension sides into broadcasts."""
    frames = []
    for name, child, ck, parent, pk in _FK_RELS:
        c = load_table(spark, sf_dir, child).select(ck)
        p = load_table(spark, sf_dir, parent).select(pk)
        n_child = c.agg(F.count(F.lit(1)).alias("n_child"))
        n_orph = (
            c.join(p, c[ck] == p[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        n_par = p.agg(F.count(F.lit(1)).alias("n_parents"))
        n_less = (
            p.join(c, c[ck] == p[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_childless"))
        )
        frames.append(
            n_child.crossJoin(n_orph).crossJoin(n_par).crossJoin(n_less)
            .select(
                F.lit(name).alias("relationship"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
                F.col("n_parents").cast("long").alias("n_parents"),
                F.col("n_childless").cast("long").alias("n_childless"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# --- conversion latency quantiles (r5 continuation) ---------------------------


@register(
    "funnel_latency_quantiles",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS fv FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS fp
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.fv
      GROUP BY 1
    ),
    lat AS (
      SELECT p.user_id, datediff('second', v.fv, p.fp) AS sec
      FROM p JOIN v ON v.user_id = p.user_id
    ),
    r AS (
      SELECT sec, row_number() OVER (ORDER BY sec, user_id) AS rn,
             count(*) OVER () AS n
      FROM lat
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converters,
           CAST(max(CASE WHEN rn = (25 * n + 99) // 100 THEN sec END)
                AS BIGINT) AS p25_sec,
           CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN sec END)
                AS BIGINT) AS p50_sec,
           CAST(max(CASE WHEN rn = (75 * n + 99) // 100 THEN sec END)
                AS BIGINT) AS p75_sec
    FROM r
    """,
)
def funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user whose first
    purchase follows their first view, the view→purchase latency in
    whole seconds, summarized as rank-selected p25/p50/p75 (type-1
    quantiles: smallest value with cdf ≥ q, rn = ceil(q·n) computed in
    INTEGER arithmetic — (q%·n + 99) div 100 — so no engine float or
    interpolation convention is involved; ties in latency are ordered
    by user_id for a total order). The latency frame is user-grain —
    bounded by converters, not events — built from the same
    monotone-shrinking user-key-co-partitioned joins as
    conversion_funnel_3step; the quantile sort runs on that bounded
    frame. The product-analytics companion the 3-step count funnel
    doesn't answer: not HOW MANY convert, but HOW LONG it takes."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("fv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"), F.min("fv").alias("fv"))
    )
    lat = p.select(
        "user_id",
        (
            F.col("fp").cast("long") - F.col("fv").cast("long")
        ).alias("sec"),
    )
    w = Window.partitionBy(F.lit(1) * F.lit(1)).orderBy("sec", "user_id")
    wc = Window.partitionBy(F.lit(1) * F.lit(1))
    r = lat.select(
        "sec",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    def _cut(q: int):
        return F.expr(f"({q} * n + 99) div 100")

    return r.agg(
        F.max("n").cast("long").alias("n_converters"),
        F.max(F.when(F.col("rn") == _cut(25), F.col("sec")))
        .cast("long")
        .alias("p25_sec"),
        F.max(F.when(F.col("rn") == _cut(50), F.col("sec")))
        .cast("long")
        .alias("p50_sec"),
        F.max(F.when(F.col("rn") == _cut(75), F.col("sec")))
        .cast("long")
        .alias("p75_sec"),
    )


# --- marketing attribution + fulfillment lead time (r5 continuation) ---------


@register(
    "attribution_first_last_touch",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    np AS (
      SELECT user_id, event_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'
    ),
    last_touch AS (
      SELECT p.event_id, np.event_type AS channel
      FROM p JOIN np ON np.user_id = p.user_id
        AND (np.ts < p.ts OR (np.ts = p.ts AND np.event_id < p.event_id))
      QUALIFY row_number() OVER (
        PARTITION BY p.event_id
        ORDER BY np.ts DESC, np.event_id DESC) = 1
    ),
    first_touch AS (
      SELECT p.event_id, np.event_type AS channel
      FROM p JOIN np ON np.user_id = p.user_id
        AND (np.ts < p.ts OR (np.ts = p.ts AND np.event_id < p.event_id))
      QUALIFY row_number() OVER (
        PARTITION BY p.event_id
        ORDER BY np.ts ASC, np.event_id ASC) = 1
    ),
    u AS (
      SELECT 'first_touch' AS model, f.channel, p.value
      FROM p JOIN first_touch f USING (event_id)
      UNION ALL
      SELECT 'last_touch', l.channel, p.value
      FROM p JOIN last_touch l USING (event_id)
    )
    SELECT model, channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           ROUND(sum(value), 2) AS attributed_value
    FROM u GROUP BY 1, 2
    """,
)
def attribution_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution under the two bookend models: every
    purchase's value credited to the user's FIRST preceding
    non-purchase event (first-touch: what acquired them) and to the
    LAST one before the purchase (last-touch: what converted them),
    side by side per channel — the report whose first/last gap IS the
    argument for multi-touch models. One per-user window pass ranks
    candidate touches from both ends ((ts, event_id) total order, so
    same-instant ties are deterministic); purchases with no prior
    touch drop from both models identically. All joins are
    user-key-co-partitioned; output is models × channels rows."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"), "value",
    )
    np_ = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"), F.col("event_type").alias("channel"),
    )
    j = p.join(np_, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        | ((F.col("t_ts") == F.col("p_ts")) & (F.col("t_id") < F.col("p_id")))
    )
    wl = Window.partitionBy("p_id").orderBy(F.desc("t_ts"), F.desc("t_id"))
    wf = Window.partitionBy("p_id").orderBy(F.asc("t_ts"), F.asc("t_id"))
    last = (
        j.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select("p_id", "channel", "value")
        .withColumn("model", F.lit("last_touch"))
    )
    first = (
        j.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("p_id", "channel", "value")
        .withColumn("model", F.lit("first_touch"))
    )
    return (
        first.unionAll(last)
        .groupBy("model", "channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@register(
    "ship_lead_time_quantiles",
    oracle="""
    WITH lt AS (
      SELECT o.o_orderpriority AS priority,
             datediff('day', o.o_orderdate, l.l_shipdate) AS days,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    r AS (
      SELECT priority, days,
             row_number() OVER (PARTITION BY priority
               ORDER BY days, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY priority) AS n
      FROM lt
    )
    SELECT priority, CAST(max(n) AS BIGINT) AS n_lines,
           CAST(max(CASE WHEN rn = (25 * n + 99) // 100 THEN days END)
                AS BIGINT) AS p25_days,
           CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN days END)
                AS BIGINT) AS p50_days,
           CAST(max(CASE WHEN rn = (95 * n + 99) // 100 THEN days END)
                AS BIGINT) AS p95_days
    FROM r GROUP BY 1
    """,
)
def ship_lead_time_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time p25/p50/p95 per order priority — the
    fulfillment SLA report (does 1-URGENT actually ship faster, and
    what does the p95 tail look like?). Lead times are exact integer
    day differences; quantiles are rank-selected with the same integer
    (q·n+99) div 100 arithmetic as funnel_latency_quantiles, ordered
    by (days, orderkey, linenumber) for a total order. The window
    partitions by priority (5 bounded partitions of the joined frame;
    at extreme scale swap in the binned approx machinery). The join is
    the standard fact-to-orders key shuffle. NOTE the synthetic
    generator draws shipdates independently of order dates, so lead
    times here are frequently negative — the operator reports what
    the data says (tests pin only the quantile ordering)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lt = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("days"),
        "l_orderkey", "l_linenumber",
    )
    wo = Window.partitionBy("priority").orderBy(
        "days", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("priority")
    r = lt.select(
        "priority", "days",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def _cut(q: int):
        return F.expr(f"({q} * n + 99) div 100")

    return r.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_lines"),
        F.max(F.when(F.col("rn") == _cut(25), F.col("days")))
        .cast("long")
        .alias("p25_days"),
        F.max(F.when(F.col("rn") == _cut(50), F.col("days")))
        .cast("long")
        .alias("p50_days"),
        F.max(F.when(F.col("rn") == _cut(95), F.col("days")))
        .cast("long")
        .alias("p95_days"),
    )


@register(
    "revenue_gini_by_nation",
    oracle="""
    WITH rev AS (
      SELECT c.c_custkey, c.c_nationkey,
             COALESCE(CAST(round(sum(o.o_totalprice * 100)) AS BIGINT), 0)
               AS cents
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT c_nationkey, cents,
             row_number() OVER (PARTITION BY c_nationkey
               ORDER BY cents, c_custkey) AS i,
             count(*) OVER (PARTITION BY c_nationkey) AS n
      FROM rev
    ),
    g AS (
      SELECT c_nationkey, max(n) AS n,
             sum(i * cents) AS swx, sum(cents) AS sx
      FROM r GROUP BY 1
    )
    SELECT nn.n_name AS nation, CAST(g.n AS BIGINT) AS n_customers,
           round(2e0 * g.swx / (g.n * CAST(g.sx AS DOUBLE))
                 - (g.n + 1e0) / g.n, 6) AS gini
    FROM g JOIN nation nn ON nn.n_nationkey = g.c_nationkey
    """,
)
def revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per nation — the
    concentration number next to the top-k reports: the closed form
    G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over ascending-sorted revenues
    needs ONE rank window and two integer sums (revenue carried in
    exact cents; rank i tie-broken by custkey so equal-revenue
    customers order deterministically — the formula's value is
    invariant under tie order, the determinism is for the engines'
    sake). Zero-order customers enter at 0 cents via the left join —
    a Gini that ignored them would understate concentration. Windows
    partition by nation (25 bounded partitions of the customer-grain
    frame); the revenue pre-aggregate is the standard fact-to-customer
    key shuffle."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    rev = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.coalesce(
                F.round(F.sum(F.col("o_totalprice") * 100)).cast("long"),
                F.lit(0),
            ).alias("cents")
        )
    )
    wo = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    wc = Window.partitionBy("c_nationkey")
    r = rev.select(
        "c_nationkey", "cents",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    g = r.groupBy("c_nationkey").agg(
        F.max("n").alias("n"),
        F.sum(F.col("i") * F.col("cents")).alias("swx"),
        F.sum("cents").alias("sx"),
    )
    nn = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return g.join(
        F.broadcast(nn), F.col("n_nationkey") == F.col("c_nationkey")
    ).select(
        F.col("n_name").alias("nation"),
        F.col("n").cast("long").alias("n_customers"),
        F.round(
            F.lit(2.0) * F.col("swx") / (F.col("n") * F.col("sx").cast("double"))
            - (F.col("n") + F.lit(1.0)) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "audience_overlap_daily",
    oracle="""
    WITH du AS (
      SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             user_id
      FROM events
    ),
    sz AS (SELECT event_type, day, count(*) AS n FROM du GROUP BY 1, 2),
    ov AS (
      SELECT a.event_type, a.day,
             count(*) AS n_common
      FROM du a JOIN du b
        ON b.event_type = a.event_type AND b.user_id = a.user_id
       AND b.day = a.day + INTERVAL 1 DAY
      GROUP BY 1, 2
    )
    SELECT s1.event_type, strftime(s1.day, '%Y-%m-%d') AS day,
           CAST(s1.n AS BIGINT) AS n_today,
           CAST(s2.n AS BIGINT) AS n_tomorrow,
           CAST(COALESCE(ov.n_common, 0) AS BIGINT) AS n_common,
           round(COALESCE(ov.n_common, 0) * 1e0
                 / (s1.n + s2.n - COALESCE(ov.n_common, 0)), 6) AS jaccard,
           round(1e0 - COALESCE(ov.n_common, 0) * 1e0 / s1.n, 6) AS churn_rate
    FROM sz s1
    JOIN sz s2 ON s2.event_type = s1.event_type
              AND s2.day = s1.day + INTERVAL 1 DAY
    LEFT JOIN ov ON ov.event_type = s1.event_type AND ov.day = s1.day
    """,
)
def audience_overlap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience set similarity per event_type: the exact
    Jaccard between today's and tomorrow's active-user sets, plus the
    churn rate (share of today's users absent tomorrow) — the retention
    signal at SET grain, complementing hll_rolling_7d_distinct's
    count grain (two audiences can hold their size while completely
    swapping members; this query is what catches that). All three
    counts come from one distinct (type, day, user) frame: sizes are a
    keyed aggregate, the intersection is a self-join shifted one day on
    the (type, user) key — co-partitioned, bounded by daily actives.
    The union size is derived by inclusion-exclusion, not a third
    pass."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
    ).distinct()
    sz = du.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    a = du
    b = du.select(
        F.col("event_type").alias("b_et"),
        F.col("day").alias("b_day"),
        F.col("user_id").alias("b_uid"),
    )
    ov = (
        a.join(
            b,
            (F.col("b_et") == F.col("event_type"))
            & (F.col("b_uid") == F.col("user_id"))
            & (F.col("b_day") == F.date_add("day", 1)),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s2 = sz.select(
        F.col("event_type").alias("s2_et"),
        F.col("day").alias("s2_day"),
        F.col("n").alias("n_tomorrow"),
    )
    j = (
        sz.join(
            s2,
            (F.col("s2_et") == F.col("event_type"))
            & (F.col("s2_day") == F.date_add("day", 1)),
        )
        .join(ov, ["event_type", "day"], "left")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
    )
    return j.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_today"),
        F.col("n_tomorrow").cast("long").alias("n_tomorrow"),
        F.col("n_common").cast("long").alias("n_common"),
        F.round(
            F.col("n_common") * F.lit(1.0)
            / (F.col("n") + F.col("n_tomorrow") - F.col("n_common")),
            6,
        ).alias("jaccard"),
        F.round(
            F.lit(1.0) - F.col("n_common") * F.lit(1.0) / F.col("n"), 6
        ).alias("churn_rate"),
    )


# --- RFM segmentation + Kaplan-Meier churn survival (r5 continuation) --------


@register(
    "rfm_segments",
    oracle="""
    WITH t AS (SELECT max(ts) AS t_end FROM events),
    u AS (
      SELECT user_id,
             datediff('day', max(ts), (SELECT t_end FROM t)) AS recency_days,
             count(*) AS frequency,
             CAST(round(sum(value) * 100) AS BIGINT) AS monetary_cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    r AS (
      SELECT user_id,
             row_number() OVER (ORDER BY recency_days DESC, user_id) AS r_rn,
             row_number() OVER (ORDER BY frequency ASC, user_id) AS f_rn,
             row_number() OVER (ORDER BY monetary_cents ASC, user_id) AS m_rn,
             count(*) OVER () AS n
      FROM u
    ),
    s AS (
      SELECT user_id,
             least(4, (r_rn - 1) * 4 // n + 1) AS r_score,
             least(4, (f_rn - 1) * 4 // n + 1) AS f_score,
             least(4, (m_rn - 1) * 4 // n + 1) AS m_score
      FROM r
    )
    SELECT concat(r_score, f_score, m_score) AS segment,
           CAST(count(*) AS BIGINT) AS n_users
    FROM s GROUP BY 1
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per
    purchasing user, Recency (days since last purchase at the corpus
    horizon), Frequency (purchase count) and Monetary (exact cents),
    each scored into quartiles 1-4 by INTEGER rank arithmetic
    ((rank-1)·4 div n + 1, ranks totally ordered with user_id
    tie-break so both engines cut identically — quartile EDGES never
    depend on float percentile conventions), concatenated into the
    '444'-style segment label and counted. Recency ranks DESCENDING
    (most-recent = highest score) while F and M rank ascending. The
    user-grain frame is one purchase-filtered aggregate; the three
    rank windows run over it (bounded by purchasers; at extreme scale
    the quartile edges come from the binned-quantile machinery
    instead)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    t_end = ev.agg(F.max("ts").alias("t_end"))
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_p"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value") * 100).cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(t_end))
        .select(
            "user_id",
            F.datediff(
                F.col("t_end").cast("date"), F.col("last_p").cast("date")
            ).alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    one = Window.partitionBy(F.lit(1) * F.lit(1))
    wr = one.orderBy(F.desc("recency_days"), F.asc("user_id"))
    wf = one.orderBy(F.asc("frequency"), F.asc("user_id"))
    wm = one.orderBy(F.asc("monetary_cents"), F.asc("user_id"))
    r = u.select(
        "user_id",
        F.row_number().over(wr).alias("r_rn"),
        F.row_number().over(wf).alias("f_rn"),
        F.row_number().over(wm).alias("m_rn"),
        F.count(F.lit(1)).over(one).alias("n"),
    )

    def score(rn: str):
        return F.least(
            F.lit(4), F.expr(f"({rn} - 1) * 4 div n + 1")
        )

    s = r.select(
        F.concat(
            score("r_rn").cast("string"),
            score("f_rn").cast("string"),
            score("m_rn").cast("string"),
        ).alias("segment")
    )
    return s.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@register(
    "survival_kaplan_meier",
    oracle="""
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    mx AS (SELECT CAST(date_trunc('day', max(ts)) AS DATE) AS horizon FROM p),
    u AS (
      SELECT user_id, CAST(date_trunc('day', max(ts)) AS DATE) AS last_day
      FROM p GROUP BY 1
    ),
    d AS (
      SELECT u.last_day AS day,
             count(*) FILTER (u.last_day < mx.horizon) AS n_churned,
             count(*) FILTER (u.last_day >= mx.horizon) AS n_censored
      FROM u CROSS JOIN mx GROUP BY 1
    ),
    n AS (SELECT count(*) AS total FROM u),
    risk AS (
      SELECT day, n_churned, n_censored,
             n.total
             - COALESCE(sum(n_churned + n_censored) OVER (
                 ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS n_at_risk
      FROM d CROSS JOIN n
    ),
    km AS (
      SELECT day, n_at_risk, n_churned, n_censored,
             sum(CAST(round(ln(1e0 - n_churned * 1e0 / n_at_risk) * 1e9)
                      AS BIGINT)) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS lsu
      FROM risk
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_churned AS BIGINT) AS n_churned,
           CAST(n_censored AS BIGINT) AS n_censored,
           round(exp(CAST(lsu AS DOUBLE) / 1e9), 6) AS survival
    FROM km
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier PURCHASE-churn survival curve — the estimator
    S(t) = Π(1 − d_i/n_i) over churn days, with users still active on
    the horizon day right-CENSORED (they haven't churned, they ran out
    of observation — the distinction every naive 'retention curve'
    gets wrong). Churn day = the user's last active day; at-risk at t
    = total minus everyone who exited before t (one running-sum
    window); the product telescopes as exp of a running sum of ln
    survival factors, each factor quantized to integer nano-units so
    the accumulation is order-exact (the same trick as the entropy
    sums — multiplicative chains become exact additive ones).
    d_i < n_i is structural on every day before the horizon (later
    exits are still at risk), and the horizon day's exits are all
    censored, so ln(0) is unreachable. Churn is defined on the
    PURCHASE series (stopped buying), which gives the curve real exit
    days — all-activity churn is degenerate on this corpus (everyone
    logs events to the horizon). One user-grain aggregate, one
    day-grain frame, two windows — at 100 TB the curve costs what
    daily_agg costs."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    mx = ev.agg(
        F.date_trunc("day", F.max("ts")).cast("date").alias("horizon")
    )
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.max("ts")).cast("date").alias("last_day")
    )
    d = (
        u.crossJoin(F.broadcast(mx))
        .groupBy(F.col("last_day").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("last_day") < F.col("horizon"), 1).otherwise(0)
            ).alias("n_churned"),
            F.sum(
                F.when(F.col("last_day") >= F.col("horizon"), 1).otherwise(0)
            ).alias("n_censored"),
        )
    )
    n = u.agg(F.count(F.lit(1)).alias("total"))
    wprev = (
        Window.partitionBy(F.lit(1) * F.lit(1))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcur = (
        Window.partitionBy(F.lit(1) * F.lit(1))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = d.crossJoin(F.broadcast(n)).withColumn(
        "n_at_risk",
        F.col("total")
        - F.coalesce(
            F.sum(F.col("n_churned") + F.col("n_censored")).over(wprev),
            F.lit(0),
        ),
    )
    km = risk.withColumn(
        "lsu",
        F.sum(
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("n_churned") * F.lit(1.0) / F.col("n_at_risk")
                )
                * F.lit(1e9)
            ).cast("long")
        ).over(wcur),
    )
    return km.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_churned").cast("long").alias("n_churned"),
        F.col("n_censored").cast("long").alias("n_censored"),
        F.round(F.exp(F.col("lsu").cast("double") / F.lit(1e9)), 6).alias(
            "survival"
        ),
    )


_GTEST_TOPK = 20


@register(
    "user_behavior_outliers",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS o FROM events GROUP BY 1, 2
    ),
    ut AS (SELECT user_id, sum(o) AS n_u FROM c GROUP BY 1),
    tt AS (SELECT event_type, sum(o) AS n_t FROM c GROUP BY 1),
    g AS (SELECT sum(o) AS n FROM c),
    terms AS (
      SELECT c.user_id,
             CAST(round(2e0 * c.o
                        * ln(c.o * 1e0
                             / (ut.n_u * 1e0 * tt.n_t / g.n)) * 1e9)
                  AS BIGINT) AS tu
      FROM c JOIN ut USING (user_id) JOIN tt USING (event_type)
      CROSS JOIN g
    ),
    s AS (
      SELECT t.user_id, ut.n_u,
             round(CAST(sum(t.tu) AS DOUBLE) / 1e9, 6) AS g_stat
      FROM terms t JOIN ut ON ut.user_id = t.user_id
      GROUP BY 1, 2
    )
    SELECT user_id, CAST(n_u AS BIGINT) AS n_events, g_stat
    FROM s ORDER BY g_stat DESC, user_id LIMIT {_GTEST_TOPK}
    """,
)
def user_behavior_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_GTEST_TOPK} behavioral outlier users by the G-test
    statistic of their event-type mix against the population mix —
    the BEHAVIOR-space outlier detector next to the VALUE-space ones
    (MAD z-scores, seasonal residuals): bots and abusers have normal
    values but skewed type distributions (all clicks, no views), and
    G = 2·Σ O·ln(O/E) is the likelihood-ratio test that scores exactly
    that, with E = row-total × col-total / N under independence. Every
    input is an exact integer count; each user-type term is quantized
    to nano-units before the per-user sum (order-exact, the entropy
    trick); zero-count cells contribute nothing by construction
    (absent rows, not ln(0)). Two keyed aggregates + two broadcast
    marginals + a TakeOrdered head — cost of a groupBy, works at any
    user cardinality."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("o")
    )
    ut = c.groupBy("user_id").agg(F.sum("o").alias("n_u"))
    tt = c.groupBy("event_type").agg(F.sum("o").alias("n_t"))
    g = c.agg(F.sum("o").alias("n"))
    terms = (
        c.join(ut, "user_id")
        .join(F.broadcast(tt), "event_type")
        .crossJoin(F.broadcast(g))
        .select(
            "user_id", "n_u",
            F.round(
                F.lit(2.0)
                * F.col("o")
                * F.log(
                    F.col("o") * F.lit(1.0)
                    / (
                        F.col("n_u") * F.lit(1.0) * F.col("n_t")
                        / F.col("n")
                    )
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("tu"),
        )
    )
    s = terms.groupBy("user_id", "n_u").agg(
        F.round(F.sum("tu").cast("double") / F.lit(1e9), 6).alias("g_stat")
    )
    return (
        s.orderBy(F.desc("g_stat"), F.asc("user_id"))
        .limit(_GTEST_TOPK)
        .select(
            "user_id",
            F.col("n_u").cast("long").alias("n_events"),
            "g_stat",
        )
    )


@register(
    "cohort_ltv_triangle",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (SELECT user_id, min(wk) AS cohort_wk FROM p GROUP BY 1),
    cs AS (SELECT cohort_wk, count(*) AS n_users FROM c GROUP BY 1),
    r AS (
      SELECT c.cohort_wk, datediff('week', c.cohort_wk, p.wk) AS wk_idx,
             sum(p.cents) AS rev
      FROM p JOIN c USING (user_id) GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_wk, wk_idx, rev,
             sum(rev) OVER (PARTITION BY cohort_wk ORDER BY wk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
      FROM r
    )
    SELECT strftime(cum.cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(cum.wk_idx AS BIGINT) AS weeks_since,
           CAST(cs.n_users AS BIGINT) AS cohort_size,
           round(cum.rev / 1e2, 2) AS week_revenue,
           round(cum.cum_rev / 1e2, 2) AS cum_revenue,
           round(cum.cum_rev * 1e0 / cs.n_users / 1e2, 6) AS ltv_per_user
    FROM cum JOIN cs USING (cohort_wk)
    """,
)
def cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LTV triangle: cohorts keyed by FIRST-purchase week, columns
    by weeks-since-cohort, cells holding that week's revenue, the
    running cumulative, and cumulative LTV per cohort user — the
    finance-facing growth artifact (younger cohorts' curves stacked
    under older ones; payback = where ltv_per_user crosses CAC).
    Revenue rides exact integer cents end to end — the weekly sums and
    the per-cohort running cumulative are order-exact integer
    aggregates, divided back to currency only at the edge. Shape: one
    purchase-grain pass to user cohorts (min week), one keyed
    aggregate to (cohort, week-index) cells — calendar² cells at most
    — and a per-cohort running window over those cells. The count
    grain of this is cohort_retention; this is the REVENUE grain."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.date_trunc("week", "ts").cast("date").alias("wk"),
    )
    c = p.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    cs = c.groupBy("cohort_wk").agg(F.count(F.lit(1)).alias("n_users"))
    r = (
        p.join(c, "user_id")
        .groupBy(
            "cohort_wk",
            ((F.datediff("wk", "cohort_wk")) / 7).cast("long").alias("wk_idx"),
        )
        .agg(F.sum("cents").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_wk")
        .orderBy("wk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = r.withColumn("cum_rev", F.sum("rev").over(w))
    return cum.join(F.broadcast(cs), "cohort_wk").select(
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
        F.col("wk_idx").cast("long").alias("weeks_since"),
        F.col("n_users").cast("long").alias("cohort_size"),
        F.round(F.col("rev") / F.lit(1e2), 2).alias("week_revenue"),
        F.round(F.col("cum_rev") / F.lit(1e2), 2).alias("cum_revenue"),
        F.round(
            F.col("cum_rev") * F.lit(1.0) / F.col("n_users") / F.lit(1e2), 6
        ).alias("ltv_per_user"),
    )


# --- deterministic Poisson-bootstrap CI (r5 continuation) --------------------

_BOOT_B = 50
# Poisson(1) CDF thresholds for multiplicities 0..6 (repr round-trip)
_BOOT_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712,
]
_BOOT_SCALE = 2 ** 60  # md5-prefix hash range (60 bits)


def _boot_mult_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_BOOT_CDF)
    )
    return f"CASE {cases} ELSE 7 END"


@register(
    "bootstrap_ci_mean",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    d AS (
      SELECT e.event_type, e.vu, b.b,
             {_boot_mult_sql(
                 "CAST(concat('0x', substr(md5(concat(b.b, ':', e.event_id)), 1, 15)) AS BIGINT) * 1e0 / " + str(_BOOT_SCALE)
             )} AS mult
      FROM e CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) b
    ),
    m AS (
      SELECT event_type, b,
             CAST(sum(mult * vu) AS DOUBLE) / sum(mult) / 1e3 AS bmean
      FROM d GROUP BY 1, 2 HAVING sum(mult) > 0
    ),
    r AS (
      SELECT event_type, bmean,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY bmean, b) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nb
      FROM m
    ),
    pop AS (
      SELECT event_type, CAST(sum(vu) AS DOUBLE) / count(*) / 1e3 AS mean
      FROM e GROUP BY 1
    )
    SELECT pop.event_type, round(pop.mean, 6) AS mean,
           round(max(CASE WHEN rn = (25 * nb + 999) // 1000 THEN bmean END),
                 6) AS ci_lo,
           round(max(CASE WHEN rn = (975 * nb + 999) // 1000 THEN bmean END),
                 6) AS ci_hi,
           CAST(max(nb) AS BIGINT) AS n_boot
    FROM r JOIN pop USING (event_type)
    GROUP BY 1, 2
    """,
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the per-type mean via the
    DETERMINISTIC Poisson bootstrap — the bootstrap that works at
    100 TB: instead of resampling n rows with replacement (a global
    shuffle per replicate), each row enters replicate b with
    multiplicity ~ Poisson(1), and here the multiplicity is derived
    from the seeded md5 hash of (b, event_id) through the Poisson CDF
    thresholds — so both engines draw the IDENTICAL {_BOOT_B}
    replicates and the interval itself value-hashes. One fan-out of
    {_BOOT_B}× map-side-combines straight back to (type, b) cells;
    replicate means use exact integer milli-unit sums; CI bounds are
    rank-selected order statistics (integer rank arithmetic) over the
    {_BOOT_B} replicate means. The uncertainty number every mean in a
    report should carry, priced at one aggregate."""
    from pyspark.sql import Window

    from dataengineeringproject_spark.operators.similarity import (
        ensure_min_parallelism,
    )

    ev = ensure_min_parallelism(
        load_table(spark, sf_dir, "events").select(
            "event_type", "event_id",
            F.round(F.col("value") * F.lit(1e3)).cast("long").alias("vu"),
        ),
        "event_id",
    )
    d = ev.select(
        "event_type", "vu", "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("b"), F.col("event_id"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        * F.lit(1.0)
        / F.lit(float(_BOOT_SCALE))
    )
    mult = F.lit(7)
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        mult = F.when(u < F.lit(_BOOT_CDF[k]), F.lit(k)).otherwise(mult)
    m = (
        d.withColumn("mult", mult)
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.col("mult") * F.col("vu")).alias("s"),
            F.sum("mult").alias("c"),
        )
        .filter(F.col("c") > 0)
        .select(
            "event_type", "b",
            (F.col("s").cast("double") / F.col("c") / F.lit(1e3)).alias(
                "bmean"
            ),
        )
    )
    wo = Window.partitionBy("event_type").orderBy("bmean", "b")
    wc = Window.partitionBy("event_type")
    r = m.select(
        "event_type", "bmean",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("nb"),
    )
    pop = ev.groupBy("event_type").agg(
        (F.sum("vu").cast("double") / F.count(F.lit(1)) / F.lit(1e3)).alias(
            "mean"
        )
    )
    ci = r.groupBy("event_type").agg(
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(25 * nb + 999) div 1000"),
                    F.col("bmean"),
                )
            ),
            6,
        ).alias("ci_lo"),
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(975 * nb + 999) div 1000"),
                    F.col("bmean"),
                )
            ),
            6,
        ).alias("ci_hi"),
        F.max("nb").cast("long").alias("n_boot"),
    )
    return pop.join(ci, "event_type").select(
        "event_type", F.round("mean", 6).alias("mean"),
        "ci_lo", "ci_hi", "n_boot",
    )


# --- binned Mann-Whitney U drift (r5 continuation) ---------------------------

_MWU_CUT = "2024-01-16"  # sample A strictly before; B on/after


@register(
    "drift_mannwhitney_binned",
    oracle=f"""
    WITH s AS (
      SELECT event_type, min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    b AS (
      SELECT e.event_type, {_FINE_BIN_SQL} AS bin,
             CASE WHEN e.ts < TIMESTAMP '{_MWU_CUT}' THEN 1 ELSE 0 END AS in_a
      FROM events e JOIN s ON s.event_type = e.event_type
      WHERE e.value IS NOT NULL
    ),
    g AS (
      SELECT event_type, bin,
             sum(in_a) AS na, sum(1 - in_a) AS nb
      FROM b GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, bin, na, nb,
             sum(nb) OVER (PARTITION BY event_type ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nb
               AS nb_below
      FROM g
    ),
    u AS (
      SELECT event_type,
             sum(na * (2 * nb_below) + na * nb) AS u2,
             sum(na) AS na_t, sum(nb) AS nb_t,
             sum((na + nb) * (na + nb) * (na + nb) - (na + nb)) AS tie_t
      FROM c GROUP BY 1
    )
    SELECT event_type, CAST(na_t AS BIGINT) AS n_a, CAST(nb_t AS BIGINT) AS n_b,
           round(CAST(u2 AS DOUBLE) / 2e0, 1) AS u_stat,
           round((CAST(u2 AS DOUBLE) / 2e0
                  - CAST(na_t AS DOUBLE) * nb_t / 2e0)
                 / sqrt(CAST(na_t AS DOUBLE) * nb_t / 12e0
                        * ((na_t + nb_t + 1e0)
                           - CAST(tie_t AS DOUBLE)
                             / (CAST(na_t + nb_t AS DOUBLE)
                                * (na_t + nb_t - 1e0)))), 6) AS z
    FROM u
    """,
)
def drift_mannwhitney_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U location-shift test between the pre/post-cutoff
    value samples per event_type — the NONPARAMETRIC member completing
    the drift family (KS = shape distance, PSI/JS = mass divergence,
    chi2 = categorical mix; MW-U asks specifically 'did the
    distribution SHIFT, ignoring shape'). Binned on the shared
    per-type fine grid so no raw sort ever runs: within a bin values
    tie at the midrank, giving the exact binned U as pure INTEGER
    arithmetic — 2U = Σ na·(2·nb_below) + na·nb — and the classic
    tie-corrected normal z from the same integer tallies (tie term
    t³−t per bin is exact int64 up to ~2M rows per bin; past that,
    coarsen the grid). The only full-data pass is the binning
    aggregate; everything downstream is ≤ types × {_FINE_BINS}
    rows."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    s = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    ).select(F.col("event_type").alias("s_et"), "vmin", "vmax")
    b = ev.join(
        F.broadcast(s), F.col("event_type") == F.col("s_et")
    ).select(
        "event_type",
        _fine_bin(F.col("value")).alias("bin"),
        F.when(
            F.col("ts") < F.lit(_MWU_CUT).cast("timestamp"), 1
        ).otherwise(0).alias("in_a"),
    )
    g = b.groupBy("event_type", "bin").agg(
        F.sum("in_a").alias("na"),
        F.sum(1 - F.col("in_a")).alias("nb"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.withColumn("nb_below", F.sum("nb").over(w) - F.col("nb"))
    t = F.col("na") + F.col("nb")
    u = c.groupBy("event_type").agg(
        F.sum(
            F.col("na") * (2 * F.col("nb_below")) + F.col("na") * F.col("nb")
        ).alias("u2"),
        F.sum("na").alias("na_t"),
        F.sum("nb").alias("nb_t"),
        F.sum(t * t * t - t).alias("tie_t"),
    )
    n = F.col("na_t").cast("double") + F.col("nb_t")
    mu = F.col("na_t").cast("double") * F.col("nb_t") / F.lit(2.0)
    sig = F.sqrt(
        F.col("na_t").cast("double") * F.col("nb_t") / F.lit(12.0)
        * (
            (F.col("na_t") + F.col("nb_t") + F.lit(1.0))
            - F.col("tie_t").cast("double")
            / (
                (F.col("na_t") + F.col("nb_t")).cast("double")
                * (F.col("na_t") + F.col("nb_t") - F.lit(1.0))
            )
        )
    )
    return u.select(
        "event_type",
        F.col("na_t").cast("long").alias("n_a"),
        F.col("nb_t").cast("long").alias("n_b"),
        F.round(F.col("u2").cast("double") / F.lit(2.0), 1).alias("u_stat"),
        F.round(
            (F.col("u2").cast("double") / F.lit(2.0) - mu) / sig, 6
        ).alias("z"),
    )


@register(
    "revenue_lorenz_deciles",
    oracle="""
    WITH rev AS (
      SELECT c.c_custkey,
             COALESCE(CAST(round(sum(o.o_totalprice * 100)) AS BIGINT), 0)
               AS cents
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ),
    r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, c_custkey) AS rn,
             count(*) OVER () AS n
      FROM rev
    ),
    d AS (
      SELECT least(10, (rn - 1) * 10 // n + 1) AS decile, cents FROM r
    ),
    g AS (
      SELECT decile, count(*) AS n_customers, sum(cents) AS dec_cents
      FROM d GROUP BY 1
    ),
    t AS (SELECT sum(dec_cents) AS tot FROM g)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(dec_cents / 1e2, 2) AS decile_revenue,
           round(sum(dec_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1e0 / t.tot, 6) AS cum_share
    FROM g CROSS JOIN t
    """,
)
def revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve behind revenue_gini_by_nation's scalar, at
    customer-decile grain: customers ranked ascending by exact-cents
    revenue (zero-order customers included at 0 via the left join),
    cut into ten equal-count deciles by integer rank arithmetic, with
    each decile's revenue and the cumulative share — the '90% of
    revenue from the top decile' chart. cum_share is monotone and
    ends at exactly 1; the gap between the curve and the diagonal IS
    the Gini. Everything integer until the final share division; the
    rank window is customer-grain (at extreme scale, cut deciles with
    the binned-quantile machinery instead)."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    rev = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.round(F.sum(F.col("o_totalprice") * 100)).cast("long"),
                F.lit(0),
            ).alias("cents")
        )
    )
    one = Window.partitionBy(F.lit(1) * F.lit(1))
    r = rev.select(
        "cents",
        F.row_number().over(one.orderBy("cents", "c_custkey")).alias("rn"),
        F.count(F.lit(1)).over(one).alias("n"),
    )
    d = r.select(
        F.least(F.lit(10), F.expr("(rn - 1) * 10 div n + 1")).alias("decile"),
        "cents",
    )
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("dec_cents"),
    )
    t = g.agg(F.sum("dec_cents").alias("tot"))
    wcum = (
        Window.partitionBy(F.lit(1) * F.lit(1))
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        g.crossJoin(F.broadcast(t))
        .withColumn("cum", F.sum("dec_cents").over(wcum))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.round(F.col("dec_cents") / F.lit(1e2), 2).alias(
                "decile_revenue"
            ),
            F.round(
                F.col("cum") * F.lit(1.0) / F.col("tot"), 6
            ).alias("cum_share"),
        )
    )


_BURST_MIN_EVENTS = 6  # >= 5 gaps for a stable CV
_BURST_TOPK = 20


@register(
    "burstiness_by_user_topk",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT)
             - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)))
                    AS BIGINT) AS gap
      FROM events
    ),
    s AS (
      SELECT user_id, count(*) AS n_gaps,
             sum(gap) AS sg, sum(gap * gap) AS sgg
      FROM g WHERE gap IS NOT NULL GROUP BY 1
      HAVING count(*) >= {_BURST_MIN_EVENTS - 1}
    ),
    cv AS (
      SELECT user_id, n_gaps,
             round(CAST(sg AS DOUBLE) / n_gaps, 1) AS mean_gap_sec,
             round(sqrt(CAST(sgg AS DOUBLE) / n_gaps
                        - (CAST(sg AS DOUBLE) / n_gaps)
                          * (CAST(sg AS DOUBLE) / n_gaps))
                   / NULLIF(CAST(sg AS DOUBLE) / n_gaps, 0), 6) AS cv
      FROM s
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps, mean_gap_sec, cv
    FROM cv ORDER BY cv DESC, user_id LIMIT {_BURST_TOPK}
    """,
)
def burstiness_by_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BURST_TOPK} burstiest users by the coefficient of
    variation of their inter-event gaps — the TEMPORAL bot/abuse
    signal next to the type-mix one (user_behavior_outliers): humans
    are bursty (CV ≈ 1 for Poisson, > 1 for sessions), schedulers and
    scripts are metronomic (CV → 0) or pathologically spiky. Gaps are
    exact floor-epoch-second integers from a per-user lag window
    ((ts, event_id) total order); per-user Σ, Σ² are exact integer
    sums so the CV is engine-deterministic; users need ≥
    {_BURST_MIN_EVENTS - 1} gaps to rank (small-n CVs are noise). The
    lag window partitions per user — the embarrassingly parallel
    shape — and the head is a TakeOrdered heap."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).alias("sgg"),
        )
        .filter(F.col("n_gaps") >= _BURST_MIN_EVENTS - 1)
    )
    mean = F.col("sg").cast("double") / F.col("n_gaps")
    sd = F.sqrt(
        F.col("sgg").cast("double") / F.col("n_gaps") - mean * mean
    )
    cv = s.select(
        "user_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.round(mean, 1).alias("mean_gap_sec"),
        F.round(F.try_divide(sd, mean), 6).alias("cv"),
    )
    return cv.orderBy(F.desc("cv"), F.asc("user_id")).limit(_BURST_TOPK)


# --- skew-safe salted join ---------------------------------------------------

_SKEWJ_SALT = 16
_SKEWJ_TOPK = 100


@register(
    "salted_skew_join",
    oracle=f"""
    WITH dim AS (
      SELECT event_type, avg(value) AS ty_avg FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.value - d.ty_avg, 6) AS dev
    FROM events e JOIN dim d USING (event_type)
    ORDER BY abs(ROUND(e.value - d.ty_avg, 6)) DESC, e.event_id
    LIMIT {_SKEWJ_TOPK}
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-side twin of salted_skew_agg: enrich every event with
    its type's corpus-wide mean through operators/relational.salted_join
    — fact salted on a well-spread column (event_id hash mod 16), dim
    replicated once per salt bucket, join on (event_type, __salt).
    event_type is the canonical skewed key (5 values over the whole
    corpus — a plain shuffle join lands ~1/5th of 100 TB on ONE reducer
    per type; salting caps any reduce task at ~1/80th). The result is
    row-identical to the unsalted join — the salt never reaches the
    output — which is exactly what the oracle's plain join pins. Output
    is the top-{_SKEWJ_TOPK} events by absolute deviation from their
    type mean (rounded before ranking so both engines rank identical
    values; event_id tie-break), the outlier shortlist this enrichment
    shape feeds in practice. The merge hint keeps the exhibited plan
    the salted shuffle join even at test scale, where the 5-row dim
    would otherwise broadcast (at real scale the dim this stands in
    for — per-tenant configs, per-entity stats — is itself too large
    to broadcast, which is the only reason to salt at all)."""
    from dataengineeringproject_spark.operators.relational import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("ty_avg"))
    j = salted_join(
        ev,
        dim.hint("merge"),
        ["event_type"],
        salt_buckets=_SKEWJ_SALT,
        salt_on="event_id",
    )
    out = j.select(
        "event_id",
        "event_type",
        F.round(F.col("value") - F.col("ty_avg"), 6).alias("dev"),
    )
    return out.orderBy(
        F.abs(F.col("dev")).desc(), F.col("event_id").asc()
    ).limit(_SKEWJ_TOPK)


# --- Benford first-digit audit (fraud / data-quality forensics) --------------
# Expected shares log10(1 + 1/d) precomputed in Python and repr-embedded
# in BOTH engines (the DP-noise precedent: no per-engine log arithmetic,
# so the expectation is bit-identical by construction).

_BENFORD_EXP = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_CASE_SQL = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {s}" for d, s in _BENFORD_EXP.items())
    + " END"
)


@register(
    "benford_first_digit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    o AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    t AS (SELECT sum(n) AS tot FROM o)
    SELECT digit, n,
           round(n * 1e0 / tot, 6) AS obs_share,
           round({_BENFORD_CASE_SQL}, 6) AS exp_share,
           round(tot * pow(n * 1e0 / tot - {_BENFORD_CASE_SQL}, 2)
                 / ({_BENFORD_CASE_SQL}), 6) AS chi2_term
    FROM o CROSS JOIN t
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals —
    the classic forensic screen for fabricated or truncated numeric
    columns (a synthetic generator that draws uniformly, or an ETL bug
    that clips a range, bends this curve immediately). Per digit 1-9:
    observed count and share, the Benford expectation log10(1+1/d),
    and the per-digit chi-square term n·(obs−exp)²/exp whose sum is
    the goodness-of-fit statistic.

    The first digit comes from the INTEGER STRING of floor(x) — not
    from floor(x/10^floor(log10 x)), whose float log can land an exact
    power of ten on either side of the boundary depending on the
    engine's libm. Scale shape: one map-side-combined 9-group
    aggregate over the fact table, a broadcast of the 1-row total —
    nothing else."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").alias("tot"))
    exp_share = F.coalesce(
        *[
            F.when(F.col("digit") == dd, F.lit(float(s)))
            for dd, s in _BENFORD_EXP.items()
        ]
    )
    obs_share = F.col("n") * F.lit(1.0) / F.col("tot")
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(obs_share, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("exp_share"),
        F.round(
            F.col("tot") * F.pow(obs_share - exp_share, 2) / exp_share, 6
        ).alias("chi2_term"),
    )


# --- incremental materialized-view refresh ------------------------------------

_MV_CUT = "2024-01-20"  # base snapshot covers days < cut; delta is the rest


@register(
    "mv_incremental_refresh",
    oracle=f"""
    WITH src AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
             CAST(round(value * 1e6) AS BIGINT) AS vu
      FROM events
    )
    SELECT day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(vu) / 1e6 / count(*), 6) AS mean_value
    FROM src GROUP BY 1, 2
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-(day, type)
    mean-value MV refreshed by MERGING a base partial-state snapshot
    (days < {_MV_CUT}) with a delta batch's partial state — never
    re-reading the base data. The state is the classic algebraic pair
    (count, sum): both merge by addition, and the mean is derived only
    at read time, which is why the MV admits O(delta) refresh at all
    (a stored mean would not merge). Values are quantized to exact
    integer micro-units BEFORE summing so the merged sums are
    bit-identical to a full recompute under any partitioning or merge
    order — the invariant this query's oracle (a plain one-pass
    recompute of the MV definition) checks end-to-end.

    Scale shape: the delta scan prunes to the new partition(s) (day is
    the natural partition key at 100 TB), each side is one map-side
    combined aggregate, and the merge shuffles only |days|x|types|
    state rows, never events."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(ts_to_date("ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("vu"),
    )

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("vu").alias("svu")
        )

    base = _partial(ev.filter(F.col("day") < _MV_CUT))
    delta = _partial(ev.filter(F.col("day") >= _MV_CUT))
    merged = (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("cnt").alias("cnt"), F.sum("svu").alias("svu"))
    )
    return merged.select(
        "day",
        "event_type",
        F.col("cnt").cast("long").alias("n"),
        F.round(F.col("svu") / F.lit(1e6) / F.col("cnt"), 6).alias(
            "mean_value"
        ),
    )


# --- one-way ANOVA across event types ----------------------------------------
# Values quantized to integer milli-units: per-group (n, sum, sum-sq)
# are exact int64; the two lossy squarings happen on identical exact
# inputs in both engines (IEEE doubles are deterministic given identical
# operands and operation order), and each squared term is re-quantized
# to an integer before any cross-group summation, so no double SUM whose
# order the partitioning could change ever occurs.


@register(
    "anova_value_by_type",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    g AS (
      SELECT event_type, count(*) AS ng, sum(vu) AS sg,
             sum(vu * vu) AS ssg
      FROM q GROUP BY 1
    ),
    t AS (
      SELECT event_type, ng, sg, ssg,
             CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng)
                  AS BIGINT) AS tg
      FROM g
    ),
    s AS (
      SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s,
             sum(ssg) AS ss, sum(tg) AS st
      FROM t
    ),
    f AS (
      SELECT k, n,
             st - CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                       AS BIGINT) AS ssb,
             ss - st AS ssw
      FROM s
    )
    SELECT CAST(k AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n_rows,
           round(ssb / 1e6, 6) AS ss_between,
           round(ssw / 1e6, 6) AS ss_within,
           round((CAST(ssb AS DOUBLE) / (k - 1))
                 / (CAST(ssw AS DOUBLE) / (n - k)), 6) AS f_stat,
           round(CAST(ssb AS DOUBLE) / (ssb + ssw), 6) AS eta_sq
    FROM f
    """,
)
def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types: F =
    (SSB/(k-1)) / (SSW/(n-k)) plus the eta-squared effect size — the
    k-group generalization of the drift family's two-sample tests
    (KS / Mann-Whitney / PSI), answering "does ANY segment differ"
    in one pass instead of k-choose-2 pairwise tests. Sufficient
    statistics only: per-group (n, sum, sum-of-squares) of milli-unit
    quantized values are exact integers; each s_g^2/n_g term is
    re-quantized to an integer before the cross-group sum so the
    result is partitioning-invariant.

    Scale shape: ONE map-side-combined groupBy over the fact table to
    |types| rows; everything after is arithmetic on that tiny frame.
    This is the textbook sufficient-statistic reduction that makes
    classical tests free at 100 TB."""
    q = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 1e3).cast("long").alias("vu")
    )
    g = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("vu").alias("sg"),
        F.sum(F.col("vu") * F.col("vu")).alias("ssg"),
    )
    t = g.select(
        "ng", "sg", "ssg",
        F.round(
            F.col("sg").cast("double") * F.col("sg").cast("double")
            / F.col("ng")
        )
        .cast("long")
        .alias("tg"),
    )
    s = t.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("ssg").alias("ss"),
        F.sum("tg").alias("st"),
    )
    fdf = s.select(
        "k", "n",
        (
            F.col("st")
            - F.round(
                F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n")
            ).cast("long")
        ).alias("ssb"),
        (F.col("ss") - F.col("st")).alias("ssw"),
    )
    return fdf.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(F.col("ssb") / F.lit(1e6), 6).alias("ss_between"),
        F.round(F.col("ssw") / F.lit(1e6), 6).alias("ss_within"),
        F.round(
            (F.col("ssb").cast("double") / (F.col("k") - 1))
            / (F.col("ssw").cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(
            F.col("ssb").cast("double") / (F.col("ssb") + F.col("ssw")), 6
        ).alias("eta_sq"),
    )


# --- Pearson correlation matrix of lineitem numerics ---------------------------
# Per-column integer quantizers chosen so every sufficient statistic
# (sums, squares, cross products) stays inside int64 at sf >= 1:
# price in whole units, the small columns in cents.

_CORRM_COLS = [
    ("l_quantity", 100),
    ("l_extendedprice", 1),
    ("l_discount", 100),
    ("l_tax", 100),
]
_CORRM_PAIRS = [
    (a, b)
    for i, (a, _) in enumerate(_CORRM_COLS)
    for (b, _) in _CORRM_COLS[i + 1:]
]


def _corrm_oracle() -> str:
    qcols = ", ".join(
        f"CAST(round({c} * {s}) AS BIGINT) AS q_{c}" for c, s in _CORRM_COLS
    )
    sums = ["count(*) AS n"]
    for c, _ in _CORRM_COLS:
        sums.append(f"sum(q_{c}) AS sx_{c}")
        sums.append(f"sum(q_{c} * q_{c}) AS sxx_{c}")
    for a, b in _CORRM_PAIRS:
        sums.append(f"sum(q_{a} * q_{b}) AS sxy_{a}_{b}")
    branches = []
    for a, b in _CORRM_PAIRS:
        num = (
            f"(CAST(n AS DOUBLE) * CAST(sxy_{a}_{b} AS DOUBLE)"
            f" - CAST(sx_{a} AS DOUBLE) * CAST(sx_{b} AS DOUBLE))"
        )
        var = lambda c: (
            f"(CAST(n AS DOUBLE) * CAST(sxx_{c} AS DOUBLE)"
            f" - CAST(sx_{c} AS DOUBLE) * CAST(sx_{c} AS DOUBLE))"
        )
        branches.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
            f" CAST(n AS BIGINT) AS n,"
            f" round({num} / sqrt({var(a)} * {var(b)}), 6) AS corr"
            f" FROM s"
        )
    return (
        f"WITH q AS (SELECT {qcols} FROM lineitem),"
        f" s AS (SELECT {', '.join(sums)} FROM q) "
        + " UNION ALL ".join(branches)
    )


@register("corr_matrix_lineitem", oracle=_corrm_oracle())
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix (upper triangle) of the four lineitem
    numerics — the profiling pass that finds derived/redundant columns
    before feature selection. One scan computes ALL 15 sufficient
    statistics (n, four sums, four sums-of-squares, six cross
    products) as exact integers over per-column quantized values; the
    six correlations are closed-form arithmetic on the single
    statistics row. The matrix never needs a second pass or a
    per-pair job — the classic one-pass profiling shape.

    Scale shape: one map-side-combined full-table aggregate to exactly
    one row; the pair expansion is an explode of a 6-element literal
    array. No joins, no windows, no shuffle beyond the single
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        *[
            F.round(F.col(c) * s).cast("long").alias(f"q_{c}")
            for c, s in _CORRM_COLS
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, _ in _CORRM_COLS:
        aggs.append(F.sum(F.col(f"q_{c}")).alias(f"sx_{c}"))
        aggs.append(
            F.sum(F.col(f"q_{c}") * F.col(f"q_{c}")).alias(f"sxx_{c}")
        )
    for a, b in _CORRM_PAIRS:
        aggs.append(
            F.sum(F.col(f"q_{a}") * F.col(f"q_{b}")).alias(f"sxy_{a}_{b}")
        )
    s = q.agg(*aggs)

    def _var(c: str):
        return (
            F.col("n").cast("double") * F.col(f"sxx_{c}").cast("double")
            - F.col(f"sx_{c}").cast("double")
            * F.col(f"sx_{c}").cast("double")
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").cast("long").alias("n"),
                F.round(
                    (
                        F.col("n").cast("double")
                        * F.col(f"sxy_{a}_{b}").cast("double")
                        - F.col(f"sx_{a}").cast("double")
                        * F.col(f"sx_{b}").cast("double")
                    )
                    / F.sqrt(_var(a) * _var(b)),
                    6,
                ).alias("corr"),
            )
            for a, b in _CORRM_PAIRS
        ]
    )
    return s.select(F.explode(rows).alias("r")).select(
        "r.col_a", "r.col_b", "r.n", "r.corr"
    )


# --- key-skew report (shuffle-planning diagnostic) -----------------------------

_SKEWR_TOPK = 10


@register(
    "skew_report_topkeys",
    oracle=f"""
    WITH kc AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
    g AS (
      SELECT count(*) AS d, sum(cnt) AS n, max(cnt) AS mx FROM kc
    ),
    top AS (
      SELECT user_id, cnt,
             row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS rnk
      FROM kc ORDER BY cnt DESC, user_id ASC LIMIT {_SKEWR_TOPK}
    )
    SELECT top.user_id, CAST(top.cnt AS BIGINT) AS cnt,
           CAST(top.rnk AS BIGINT) AS rank,
           round(top.cnt * 1e0 / g.n, 6) AS share,
           CAST(g.d AS BIGINT) AS n_keys,
           round(g.mx * 1e0 * g.d / g.n, 6) AS skew_factor
    FROM top CROSS JOIN g
    """,
)
def skew_report_topkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report for the events fact's natural join/shuffle key
    (user_id): the top-{_SKEWR_TOPK} heaviest keys with their share,
    plus the table-level skew factor max_count / mean_count — the
    number that decides whether a shuffle on this key needs salting
    (`salted_skew_agg`/`salted_skew_join`) or AQE skew splitting
    before you pay for it. This is the diagnostic the engine's skew
    mitigations act on, made a first-class query.

    Scale shape: one map-side-combined count per key, a 1-row summary
    aggregate, a TakeOrderedAndProject heap for the top keys, and a
    1-row broadcast — the report costs one shuffle of key counts
    regardless of fact size."""
    ev = load_table(spark, sf_dir, "events")
    kc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    g = kc.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("cnt").alias("n"),
        F.max("cnt").alias("mx"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("user_id"))
    top = (
        kc.orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(_SKEWR_TOPK)
        .withColumn("rnk", F.row_number().over(w))
    )
    return top.crossJoin(F.broadcast(g)).select(
        "user_id",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("rnk").cast("long").alias("rank"),
        F.round(F.col("cnt") * F.lit(1.0) / F.col("n"), 6).alias("share"),
        F.col("d").cast("long").alias("n_keys"),
        F.round(
            F.col("mx") * F.lit(1.0) * F.col("d") / F.col("n"), 6
        ).alias("skew_factor"),
    )


# --- daily OHLC candles over event values --------------------------------------


@register(
    "ohlc_daily_value",
    oracle="""
    WITH e AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, value,
             row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d')
                                ORDER BY ts ASC, event_id ASC) AS ra,
             row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d')
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM events
    )
    SELECT day,
           round(max(CASE WHEN ra = 1 THEN value END), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(max(CASE WHEN rd = 1 THEN value END), 6) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM e GROUP BY 1
    """,
)
def ohlc_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) candles over event values —
    the time-series downsampling shape every monitoring/market system
    ships: open and close are the values at the FIRST and LAST event
    of the day under the total order (ts, event_id) (the id tiebreak
    makes simultaneous events deterministic), high/low are plain
    extrema. First/last are selected by rank-1 flags from two
    opposite-direction windows over the SAME day partitioning — one
    shuffle, two sorts — then collapsed in the same aggregate that
    computes the extrema.

    Scale shape: one hash shuffle on day; at 100 TB day is the
    partition key so the window sorts are partition-local and the
    aggregate is map-side combined."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(ts_to_date("ts"), "yyyy-MM-dd").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("day").orderBy(F.asc("ts"), F.asc("event_id"))
    wd = Window.partitionBy("day").orderBy(F.desc("ts"), F.desc("event_id"))
    e = ev.select(
        "day",
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return e.groupBy("day").agg(
        F.round(F.max(F.when(F.col("ra") == 1, F.col("value"))), 6).alias(
            "open"
        ),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rd") == 1, F.col("value"))), 6).alias(
            "close"
        ),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# --- first-order Markov transition matrix over event sequences -----------------


@register(
    "event_transition_matrix",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS cur_type, nxt AS next_type, count(*) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT cur_type, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.cur_type, c.next_type, CAST(c.n AS BIGINT) AS n,
           round(c.n * 1e0 / r.tot, 6) AS prob
    FROM c JOIN r USING (cur_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the model behind
    next-action prediction, Markov attribution, and sequence-anomaly
    scoring (a user whose transitions sit in low-probability cells is
    behaving off-pattern). Sequence order is the total order
    (ts, event_id) within each user — simultaneous events are
    deterministic. Row-normalization divides two exact integers.

    Scale shape: one shuffle on user_id for the lead() window (at
    100 TB the fact is already bucketed by user), then a
    map-side-combined count to a |types|^2 frame; the normalizing
    row-sum join runs on that tiny matrix."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = s.groupBy(
        F.col("event_type").alias("cur_type"), F.col("nxt").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    r = c.groupBy("cur_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(r), "cur_type").select(
        "cur_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * F.lit(1.0) / F.col("tot"), 6).alias("prob"),
    )


# --- trimmed mean per group (robust-stats family) -------------------------------

_TRIM_PCT = 10  # percent cut from EACH tail (integer arithmetic)


@register(
    "trimmed_mean_value",
    oracle=f"""
    WITH q AS (
      SELECT event_type, value,
             CAST(round(value * 1e3) AS BIGINT) AS vu,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    t AS (
      SELECT event_type, n, (n * {_TRIM_PCT}) // 100 AS cut, vu, rn
      FROM q
    )
    SELECT event_type,
           CAST(any_value(n) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (rn > cut AND rn <= n - cut) AS BIGINT)
             AS n_kept,
           round(sum(vu) / 1e3 / any_value(n), 6) AS raw_mean,
           round(sum(vu) FILTER (rn > cut AND rn <= n - cut) / 1e3
                 / count(*) FILTER (rn > cut AND rn <= n - cut), 6)
             AS trimmed_mean
    FROM t GROUP BY 1
    """,
)
def trimmed_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_TRIM_PCT}%%-per-tail trimmed mean of event value by type, next
    to the raw mean — the robust-location member of the outlier family
    (MAD z-scores flag points; the trimmed mean shows how much the
    tails were MOVING the headline statistic). The cut count is
    integer arithmetic (n*{_TRIM_PCT} div 100 per tail), membership
    comes from a row_number over the total order (value, event_id) so
    ties at the cut boundary resolve identically everywhere, and the
    kept-sum uses milli-unit integer values — exact under any
    partitioning.

    Scale shape: one shuffle on event_type for the rank window (the
    same sort also serves exact quantiles at scale), then a map-side
    conditional aggregate. No joins."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    wn = Window.partitionBy("event_type")
    q = ev.select(
        "event_type",
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).withColumn(
        "cut", F.expr(f"(n * {_TRIM_PCT}) div 100")
    )
    kept = (F.col("rn") > F.col("cut")) & (
        F.col("rn") <= F.col("n") - F.col("cut")
    )
    return q.groupBy("event_type").agg(
        F.any_value("n").cast("long").alias("n_total"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.round(
            F.sum("vu") / F.lit(1e3) / F.any_value("n"), 6
        ).alias("raw_mean"),
        F.round(
            F.sum(F.when(kept, F.col("vu")).otherwise(0))
            / F.lit(1e3)
            / F.sum(F.when(kept, 1).otherwise(0)),
            6,
        ).alias("trimmed_mean"),
    )


# --- STL-lite seasonal decomposition of the daily value series ------------------
# Day-of-week comes from pure integer date arithmetic (datediff from a
# fixed Monday anchor, mod 7) — never from engine dayofweek(), whose
# 0/1-origin and week-start conventions differ across engines.

_STL_ANCHOR = "2024-01-01"  # a Monday; dow 0 = Monday everywhere


@register(
    "seasonal_decompose_daily",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    d AS (
      SELECT day, sum(vu) AS svu, count(*) AS n FROM e GROUP BY 1
    ),
    tr AS (
      SELECT day, svu, n,
             sum(svu) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tsv,
             sum(n) OVER (ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tn
      FROM d
    ),
    dt AS (
      SELECT day, datediff('day', DATE '{_STL_ANCHOR}', day) % 7 AS dow,
             svu * 1e0 / n / 1e3 AS m,
             tsv * 1e0 / tn / 1e3 AS trend,
             CAST(round((svu * 1e0 / n - tsv * 1e0 / tn) * 1e3) AS BIGINT)
               AS du
      FROM tr
    ),
    se AS (SELECT dow, sum(du) AS sdu, count(*) AS c FROM dt GROUP BY 1)
    SELECT strftime(dt.day, '%Y-%m-%d') AS day,
           CAST(dt.dow AS BIGINT) AS dow,
           round(dt.m, 6) AS value,
           round(dt.trend, 6) AS trend,
           round(se.sdu * 1e0 / se.c / 1e6, 6) AS seasonal,
           round(dt.m - dt.trend - se.sdu * 1e0 / se.c / 1e6, 6) AS resid
    FROM dt JOIN se USING (dow)
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite additive decomposition of the daily mean-value series:
    trend = centered 7-day moving mean, seasonal = day-of-week mean of
    the detrended series, residual = the rest — the decomposition
    behind `seasonal_dow_anomaly` made explicit, per day. Numerics are
    engine-exact throughout: daily and trend means divide INTEGER
    window sums (milli-unit values; the moving window sums integers,
    not doubles), the detrended series re-quantizes to integers before
    the day-of-week average, and day-of-week itself is datediff-mod-7
    from a fixed Monday anchor rather than engine dayofweek
    conventions.

    Scale shape: one map-side-combined daily rollup; every window and
    join after runs on the |days| frame (tiny at any corpus size).
    The 7-day window uses ROWS so edge days shrink identically in both
    engines."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        ts_to_date("ts").alias("day"),
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
    )
    d = ev.groupBy("day").agg(
        F.sum("vu").alias("svu"), F.count(F.lit(1)).alias("n")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = d.select(
        "day", "svu", "n",
        F.sum("svu").over(w7).alias("tsv"),
        F.sum("n").over(w7).alias("tn"),
    )
    m = F.col("svu") * F.lit(1.0) / F.col("n") / F.lit(1e3)
    trend = F.col("tsv") * F.lit(1.0) / F.col("tn") / F.lit(1e3)
    dt = tr.select(
        "day",
        (F.datediff(F.col("day"), F.lit(_STL_ANCHOR).cast("date")) % 7)
        .alias("dow"),
        m.alias("m"),
        trend.alias("trend"),
        F.round(
            (F.col("svu") * F.lit(1.0) / F.col("n")
             - F.col("tsv") * F.lit(1.0) / F.col("tn")) * F.lit(1e3)
        )
        .cast("long")
        .alias("du"),
    )
    se = dt.groupBy("dow").agg(
        F.sum("du").alias("sdu"), F.count(F.lit(1)).alias("c")
    )
    seas = F.col("sdu") * F.lit(1.0) / F.col("c") / F.lit(1e6)
    return dt.join(F.broadcast(se), "dow").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("dow").cast("long").alias("dow"),
        F.round(F.col("m"), 6).alias("value"),
        F.round(F.col("trend"), 6).alias("trend"),
        F.round(seas, 6).alias("seasonal"),
        F.round(F.col("m") - F.col("trend") - seas, 6).alias("resid"),
    )


# --- CBO literacy exhibit: textbook join-size estimate vs actual ----------------

_CARD_JOINS = [
    ("orders_x_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_x_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
]


def _card_oracle() -> str:
    branches = []
    for name, ta, ka, tb, kb in _CARD_JOINS:
        branches.append(f"""
        SELECT '{name}' AS join_name,
               CAST(sa.n AS BIGINT) AS n_left,
               CAST(sb.n AS BIGINT) AS n_right,
               CAST(sa.d AS BIGINT) AS d_left,
               CAST(sb.d AS BIGINT) AS d_right,
               round(sa.n * 1e0 * sb.n / greatest(sa.d, sb.d), 6) AS est_rows,
               CAST(j.actual AS BIGINT) AS actual_rows,
               round(sa.n * 1e0 * sb.n / greatest(sa.d, sb.d) / j.actual, 6)
                 AS err_ratio
        FROM (SELECT count(*) AS n, count(DISTINCT {ka}) AS d FROM {ta}) sa
        CROSS JOIN (SELECT count(*) AS n, count(DISTINCT {kb}) AS d
                    FROM {tb}) sb
        CROSS JOIN (SELECT count(*) AS actual
                    FROM {ta} a JOIN {tb} b ON a.{ka} = b.{kb}) j
        """)
    return " UNION ALL ".join(branches)


@register("cardinality_estimate_audit", oracle=_card_oracle())
def cardinality_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit: the textbook CBO estimate
    |A JOIN B| ~ |A|*|B| / max(ndv_A, ndv_B) (uniform-key assumption,
    containment of the smaller dictionary) next to the TRUE join size,
    for the two fact joins the engine runs most. err_ratio near 1 is
    why cost-based join ordering works on these tables; the same
    report on a skewed key is the motivating evidence for the skew
    family. The estimate's inputs (row counts, exact NDVs) are what a
    catalog's ANALYZE collects — this query IS that collection plus
    the honesty check.

    Scale shape: per join, two 1-row count/NDV aggregates and one
    key-only join counted with a map-side-combined aggregate; at
    100 TB the NDV side is where you'd swap in the engine's HLL
    sketches (hll_distinct_users) and skip the exact join."""
    out = None
    for name, ta, ka, tb, kb in _CARD_JOINS:
        a = load_table(spark, sf_dir, ta).select(F.col(ka).alias("k"))
        b = load_table(spark, sf_dir, tb).select(F.col(kb).alias("k"))
        sa = a.agg(
            F.count(F.lit(1)).alias("na"), F.countDistinct("k").alias("da")
        )
        sb = b.agg(
            F.count(F.lit(1)).alias("nb"), F.countDistinct("k").alias("db")
        )
        j = a.join(b, "k").agg(F.count(F.lit(1)).alias("actual"))
        est = (
            F.col("na") * F.lit(1.0) * F.col("nb")
            / F.greatest(F.col("da"), F.col("db"))
        )
        row = (
            sa.crossJoin(F.broadcast(sb))
            .crossJoin(F.broadcast(j))
            .select(
                F.lit(name).alias("join_name"),
                F.col("na").cast("long").alias("n_left"),
                F.col("nb").cast("long").alias("n_right"),
                F.col("da").cast("long").alias("d_left"),
                F.col("db").cast("long").alias("d_right"),
                F.round(est, 6).alias("est_rows"),
                F.col("actual").cast("long").alias("actual_rows"),
                F.round(est / F.col("actual"), 6).alias("err_ratio"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# --- time-weighted average (TWAP) of the value series ---------------------------
# Weights come from wall-clock seconds-since-midnight (hour/minute/
# second fields), never epoch arithmetic: field extraction is identical
# in both engines and immune to session-timezone offsets.


@register(
    "twap_daily_value",
    oracle="""
    WITH e AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(round(value * 1e3) AS BIGINT) AS vu,
             hour(ts) * 3600 + minute(ts) * 60
               + CAST(floor(second(ts)) AS BIGINT) AS ssm,
             event_id
      FROM events
    ),
    w AS (
      SELECT day, vu,
             coalesce(lead(ssm) OVER (PARTITION BY day
                                      ORDER BY ssm ASC, event_id ASC),
                      86400) - ssm AS dur
      FROM e
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(dur) AS BIGINT) AS covered_s,
           round(sum(vu * dur) * 1e0 / sum(dur) / 1e3, 6) AS twap,
           round(sum(vu) * 1e0 / count(*) / 1e3, 6) AS mean_value
    FROM w GROUP BY 1
    """,
)
def twap_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily time-weighted average (TWAP) of the value series — each
    event's value holds until the next event (last one holds to
    midnight), so bursty periods stop dominating the average the way
    they do the plain mean (reported beside it for exactly that
    contrast). The hold durations come from lead() over the per-day
    (seconds-since-midnight, event_id) order; value*duration products
    and the duration sums are exact integers, so the weighted mean is
    two integer sums and one division. Seconds-since-midnight is
    wall-clock FIELD arithmetic (hour/minute/second), deliberately not
    epoch math: a session-timezone offset shifts every epoch value but
    no field value.

    Scale shape: one shuffle on day for the lead() window (day is the
    partition key at 100 TB, making the sort partition-local), then a
    map-side-combined daily aggregate."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(ts_to_date("ts"), "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
        (
            F.hour("ts") * 3600
            + F.minute("ts") * 60
            + F.floor(F.second("ts")).cast("long")
        ).alias("ssm"),
        "event_id",
    )
    w = Window.partitionBy("day").orderBy(F.asc("ssm"), F.asc("event_id"))
    d = ev.select(
        "day",
        "vu",
        (
            F.coalesce(F.lead("ssm").over(w), F.lit(86400)) - F.col("ssm")
        ).alias("dur"),
    )
    return d.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dur").cast("long").alias("covered_s"),
        F.round(
            F.sum(F.col("vu") * F.col("dur")) * F.lit(1.0)
            / F.sum("dur")
            / F.lit(1e3),
            6,
        ).alias("twap"),
        F.round(
            F.sum("vu") * F.lit(1.0) / F.count(F.lit(1)) / F.lit(1e3), 6
        ).alias("mean_value"),
    )


# --- anti-entropy: order-independent per-day table checksum ---------------------

from dataengineeringproject_spark.functions import text as X  # noqa: E402

_CK_ROW_SQL = (
    "concat_ws('|', CAST(event_id AS VARCHAR), strftime(ts, '%Y-%m-%d %H:%M:%S'), "
    "CAST(user_id AS VARCHAR), event_type, "
    "CAST(CAST(round(value * 1e3) AS BIGINT) AS VARCHAR), coalesce(props, ''))"
)


@register(
    "table_checksum_by_day",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({X.token_hash_sql(_CK_ROW_SQL, seed='ck-v1')} % 4294967296)
                AS BIGINT) AS checksum
    FROM events GROUP BY 1
    """,
)
def table_checksum_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy table digest: an ORDER-INDEPENDENT per-day
    checksum (sum of seeded 32-bit row hashes over a canonical row
    string) plus row count — the cheap comparison two replicas, two
    engines, or two pipeline versions exchange to find which
    partitions disagree before diffing any rows (the Merkle-leaf level
    of Cassandra/Dynamo-style repair, and exactly how a migration
    validates a backfill). Summation makes it insensitive to row
    order and partitioning; the canonical string pins float formatting
    (milli-unit integers) and second-level timestamps so both engines
    hash identical bytes. This query literally runs the comparison:
    the oracle computes the digest in DuckDB and the driver asserts
    equality.

    Scale shape: a pure projection (concat + md5) into a
    map-side-combined per-day aggregate; one tiny shuffle. At 100 TB
    you'd fold in a second level (per day x bucket) to narrow repairs;
    same plan, one more group key."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date

    ev = load_table(spark, sf_dir, "events")
    row = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.round(F.col("value") * 1e3).cast("long").cast("string"),
        F.coalesce(F.col("props"), F.lit("")),
    )
    return (
        ev.select(
            F.date_format(ts_to_date("ts"), "yyyy-MM-dd").alias("day"),
            (X.token_hash(row, seed="ck-v1") % F.lit(4294967296)).alias("h"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("h").cast("long").alias("checksum"),
        )
    )


# --- two-proportion z-test over a hash-assigned experiment ----------------------

_AB_SEED = "ab-v1"
_AB_CONV_EVENT = "purchase"
_AB_CONV_MIN_VALUE = 150  # conversion = a purchase above this value


@register(
    "abtest_two_proportion",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_AB_SEED)} % 2
               AS variant,
             max(CASE WHEN event_type = '{_AB_CONV_EVENT}'
                      AND value > {_AB_CONV_MIN_VALUE} THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS ca,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
             sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS cb
      FROM u
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           round(ca * 1e0 / na, 6) AS rate_a,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           round(cb * 1e0 / nb, 6) AS rate_b,
           round((ca * 1e0 / na - cb * 1e0 / nb)
                 / sqrt(((ca + cb) * 1e0 / (na + nb))
                        * (1e0 - (ca + cb) * 1e0 / (na + nb))
                        * (1e0 / na + 1e0 / nb)), 6) AS z_score
    FROM s
    """,
)
def abtest_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the A/B experimentation primitive:
    users are hash-assigned to variants (seeded doc-hash mod 2, the
    engine's standard reproducible randomization — the SAME assignment
    every run, engine, and cluster size, which is what makes an
    experiment auditable), conversion is "user ever fired a
    {_AB_CONV_EVENT} event above value {_AB_CONV_MIN_VALUE}" (the threshold
    keeps the rate mid-range so the pooled variance is non-degenerate), and the pooled-variance z-score tests the
    rate difference. Completes the inference family: ANOVA for k-group
    means, Mann-Whitney/KS for distributions, chi-square for mixes,
    now proportions for experiments. All counts are exact integers;
    the z arithmetic is fixed-operand IEEE, identical in both engines.

    Scale shape: one map-side-combined per-user aggregate (the only
    shuffle, on the natural user key), then a 4-integer single-row
    reduce. Free at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == _AB_CONV_EVENT)
                & (F.col("value") > _AB_CONV_MIN_VALUE),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        (X.token_hash(F.col("user_id").cast("string"), seed=_AB_SEED) % 2)
        .alias("variant"),
        "conv",
    )
    s = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .alias("ca"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .alias("cb"),
    )
    ra = F.col("ca") * F.lit(1.0) / F.col("na")
    rb = F.col("cb") * F.lit(1.0) / F.col("nb")
    p = (F.col("ca") + F.col("cb")) * F.lit(1.0) / (F.col("na") + F.col("nb"))
    return s.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.round(ra, 6).alias("rate_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        F.round(rb, 6).alias("rate_b"),
        F.round(
            (ra - rb)
            / F.sqrt(
                p
                * (F.lit(1.0) - p)
                * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
            ),
            6,
        ).alias("z_score"),
    )


# --- week-over-week growth by event type ---------------------------------------


@register(
    "wow_growth_by_type",
    oracle=f"""
    WITH e AS (
      SELECT datediff('day', DATE '{_STL_ANCHOR}', CAST(ts AS DATE)) // 7
               AS week_idx,
             event_type,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    w AS (
      SELECT week_idx, event_type, count(*) AS n, sum(vu) AS svu
      FROM e GROUP BY 1, 2
    ),
    g AS (
      SELECT week_idx, event_type, n, svu,
             lag(n) OVER (PARTITION BY event_type ORDER BY week_idx) AS pn,
             lag(svu) OVER (PARTITION BY event_type ORDER BY week_idx)
               AS psvu
      FROM w
    )
    SELECT CAST(week_idx AS BIGINT) AS week_idx, event_type,
           CAST(n AS BIGINT) AS n,
           round(svu / 1e3 / n, 6) AS mean_value,
           round((n - pn) * 1e0 / pn, 6) AS count_growth,
           round((svu * 1e0 / n - psvu * 1e0 / pn)
                 / (psvu * 1e0 / pn), 6) AS mean_growth
    FROM g
    """,
)
def wow_growth_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth report per event type: count growth and
    mean-value growth against the previous week, the
    period-over-period BI primitive. Week index is integer
    datediff-div-7 from the fixed Monday anchor (no engine ISO-week
    conventions), growth divides exact integer aggregates, and the
    first week reports NULL growth rather than a fake zero.

    Scale shape: one map-side-combined groupBy to |weeks|x|types|
    rows; the lag() window runs on that tiny frame."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        ts_to_date("ts").alias("day"),
        "event_type",
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
    ).select(
        F.expr(
            f"datediff(day, date'{_STL_ANCHOR}') div 7"
        ).alias("week_idx"),
        "event_type",
        "vu",
    )
    w = ev.groupBy("week_idx", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vu").alias("svu")
    )
    lw = Window.partitionBy("event_type").orderBy("week_idx")
    g = w.select(
        "week_idx", "event_type", "n", "svu",
        F.lag("n").over(lw).alias("pn"),
        F.lag("svu").over(lw).alias("psvu"),
    )
    mean_now = F.col("svu") * F.lit(1.0) / F.col("n")
    mean_prev = F.col("psvu") * F.lit(1.0) / F.col("pn")
    return g.select(
        F.col("week_idx").cast("long").alias("week_idx"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("svu") / F.lit(1e3) / F.col("n"), 6).alias(
            "mean_value"
        ),
        F.round((F.col("n") - F.col("pn")) * F.lit(1.0) / F.col("pn"), 6)
        .alias("count_growth"),
        F.round((mean_now - mean_prev) / mean_prev, 6).alias("mean_growth"),
    )


# --- change-point detection: best single split of the daily series -------------


@register(
    "changepoint_single_split",
    oracle="""
    WITH e AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    d AS (SELECT day, sum(vu) AS s, count(*) AS n FROM e GROUP BY 1),
    p AS (
      SELECT day,
             sum(s) OVER (ORDER BY day) AS cs,
             sum(n) OVER (ORDER BY day) AS cn,
             sum(s) OVER () AS ts, sum(n) OVER () AS tn,
             row_number() OVER (ORDER BY day) AS rn,
             count(*) OVER () AS nd
      FROM d
    ),
    g AS (
      SELECT day, cs, cn, ts, tn,
             CAST(round(CAST(cs AS DOUBLE) * cs / cn) AS BIGINT)
             + CAST(round(CAST(ts - cs AS DOUBLE) * (ts - cs) / (tn - cn))
                    AS BIGINT)
             - CAST(round(CAST(ts AS DOUBLE) * ts / tn) AS BIGINT) AS gain
      FROM p WHERE rn < nd
    )
    SELECT day AS split_day,
           round(gain / 1e6, 6) AS sse_gain,
           CAST(cn AS BIGINT) AS n_left,
           CAST(tn - cn AS BIGINT) AS n_right,
           round(cs * 1e0 / cn / 1e3, 6) AS mean_left,
           round((ts - cs) * 1e0 / (tn - cn) / 1e3, 6) AS mean_right
    FROM g ORDER BY gain DESC, split_day ASC LIMIT 1
    """,
)
def changepoint_single_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection, binary-segmentation step: the single
    split of the daily value series that maximally reduces the sum of
    squared error — equivalently maximizes S_L^2/N_L + S_R^2/N_R -
    S^2/N over all prefix/suffix splits (the recursion step of binary
    segmentation, and the offline complement of the streaming CUSUM
    detector). Each squared-sum term is re-quantized to an integer
    (the ANOVA trick) so the argmax compares exact integers and the
    earliest-day tie-break is deterministic.

    Scale shape: one map-side-combined daily rollup; prefix sums,
    candidate gains, and the argmax all run on the |days| frame."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(ts_to_date("ts"), "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
    )
    d = ev.groupBy("day").agg(
        F.sum("vu").alias("s"), F.count(F.lit(1)).alias("n")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = d.select(
        "day",
        F.sum("s").over(wc).alias("cs"),
        F.sum("n").over(wc).alias("cn"),
        F.sum("s").over(wa).alias("ts"),
        F.sum("n").over(wa).alias("tn"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(wa).alias("nd"),
    )

    def _q(num, den):
        return F.round(num.cast("double") * num / den).cast("long")

    g = p.filter(F.col("rn") < F.col("nd")).select(
        "day", "cs", "cn", "ts", "tn",
        (
            _q(F.col("cs"), F.col("cn"))
            + _q(F.col("ts") - F.col("cs"), F.col("tn") - F.col("cn"))
            - _q(F.col("ts"), F.col("tn"))
        ).alias("gain"),
    )
    return (
        g.orderBy(F.desc("gain"), F.asc("day"))
        .limit(1)
        .select(
            F.col("day").alias("split_day"),
            F.round(F.col("gain") / F.lit(1e6), 6).alias("sse_gain"),
            F.col("cn").cast("long").alias("n_left"),
            (F.col("tn") - F.col("cn")).cast("long").alias("n_right"),
            F.round(F.col("cs") * F.lit(1.0) / F.col("cn") / 1e3, 6).alias(
                "mean_left"
            ),
            F.round(
                (F.col("ts") - F.col("cs")) * F.lit(1.0)
                / (F.col("tn") - F.col("cn"))
                / 1e3,
                6,
            ).alias("mean_right"),
        )
    )


# --- power analysis for the A/B test --------------------------------------------
# Normal-approximation constants precomputed in Python and repr-embedded
# in both engines (the DP-noise precedent: no per-engine inverse-normal).

_PWR_Z_ALPHA = "1.959963984540054"   # z_{0.025}: two-sided alpha = 5%
_PWR_Z_BETA = "0.8416212335729143"   # z_{0.80}: power = 80%


@register(
    "abtest_power_analysis",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_AB_SEED)} % 2
               AS variant,
             max(CASE WHEN event_type = '{_AB_CONV_EVENT}'
                      AND value > {_AB_CONV_MIN_VALUE} THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS ca,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
             sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS cb
      FROM u
    ),
    p AS (
      SELECT ca * 1e0 / na AS p1, cb * 1e0 / nb AS p2,
             (ca + cb) * 1e0 / (na + nb) AS pp,
             na, nb
      FROM s
    )
    SELECT round(p1, 6) AS rate_a, round(p2, 6) AS rate_b,
           round(abs(p1 - p2), 6) AS abs_diff,
           CAST(na AS BIGINT) AS n_a_have,
           CAST(nb AS BIGINT) AS n_b_have,
           round(pow({_PWR_Z_ALPHA} * sqrt(2e0 * pp * (1e0 - pp))
                     + {_PWR_Z_BETA} * sqrt(p1 * (1e0 - p1)
                                            + p2 * (1e0 - p2)), 2)
                 / NULLIF((p1 - p2) * (p1 - p2), 0), 6)
             AS n_required_per_arm
    FROM p
    """,
)
def abtest_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis for `abtest_two_proportion`: the sample size each
    arm would need to detect the OBSERVED rate difference with 80%%
    power at two-sided alpha 5%% (normal approximation,
    n = (z_a*sqrt(2*pbar*qbar) + z_b*sqrt(p1*q1 + p2*q2))^2 / delta^2)
    next to the traffic actually collected — the "is this experiment
    even big enough" report every platform pairs with the z-test. The
    z constants are Python-precomputed repr literals so neither engine
    runs an inverse normal; NULL when the observed rates are exactly
    equal (infinite n).

    Scale shape: identical to the z-test — one per-user aggregate,
    one 4-integer reduce, closed-form arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == _AB_CONV_EVENT)
                & (F.col("value") > _AB_CONV_MIN_VALUE),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        (X.token_hash(F.col("user_id").cast("string"), seed=_AB_SEED) % 2)
        .alias("variant"),
        "conv",
    )
    s = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .alias("ca"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .alias("cb"),
    )
    p1 = F.col("ca") * F.lit(1.0) / F.col("na")
    p2 = F.col("cb") * F.lit(1.0) / F.col("nb")
    pp = (F.col("ca") + F.col("cb")) * F.lit(1.0) / (F.col("na") + F.col("nb"))
    za, zb = float(_PWR_Z_ALPHA), float(_PWR_Z_BETA)
    num = F.pow(
        F.lit(za) * F.sqrt(F.lit(2.0) * pp * (F.lit(1.0) - pp))
        + F.lit(zb)
        * F.sqrt(p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2)),
        2,
    )
    return s.select(
        F.round(p1, 6).alias("rate_a"),
        F.round(p2, 6).alias("rate_b"),
        F.round(F.abs(p1 - p2), 6).alias("abs_diff"),
        F.col("na").cast("long").alias("n_a_have"),
        F.col("nb").cast("long").alias("n_b_have"),
        F.round(
            num / F.nullif((p1 - p2) * (p1 - p2), F.lit(0.0)), 6
        ).alias("n_required_per_arm"),
    )


# --- Simpson's paradox audit ------------------------------------------------


@register(
    "simpsons_paradox_audit",
    oracle="""
    WITH q AS (
      SELECT p.p_brand AS g,
             CAST(round(l.l_discount * 100) AS BIGINT) AS x,
             CAST(round(l.l_quantity * 100) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
      SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM q GROUP BY 1
    ),
    c AS (
      SELECT g, n,
             round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / NULLIF(sqrt((CAST(n AS DOUBLE) * sxx
                                  - CAST(sx AS DOUBLE) * sx)
                                 * (CAST(n AS DOUBLE) * syy
                                    - CAST(sy AS DOUBLE) * sy)), 0), 6)
               AS r
      FROM s
    ),
    t AS (
      SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy, sum(sxy) AS sxy,
             sum(sxx) AS sxx, sum(syy) AS syy
      FROM s
    ),
    o AS (
      SELECT round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / NULLIF(sqrt((CAST(n AS DOUBLE) * sxx
                                  - CAST(sx AS DOUBLE) * sx)
                                 * (CAST(n AS DOUBLE) * syy
                                    - CAST(sy AS DOUBLE) * sy)), 0), 6)
               AS r_all
      FROM t
    )
    SELECT o.r_all AS overall_corr,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN c.r * o.r_all < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_opposite_sign,
           CAST(sum(CASE WHEN c.r * o.r_all < 0 THEN c.n ELSE 0 END)
                AS BIGINT) AS rows_in_opposite,
           (sum(CASE WHEN c.r * o.r_all < 0 THEN c.n ELSE 0 END) * 2
              > (SELECT n FROM t)) AS paradox
    FROM c CROSS JOIN o
    GROUP BY o.r_all
    """,
)
def simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit of the discount->quantity relationship:
    the POOLED Pearson correlation next to how many per-brand strata
    correlate with the OPPOSITE sign (and how much row mass they
    carry; paradox = a majority of rows live in opposite-sign strata).
    This is the classic aggregation trap every analytics engine should
    ship a detector for — a pooled trend that reverses within every
    stratum is a confounder artifact, not a finding. All sufficient
    statistics are exact integers (cent-unit quantization); the pooled
    statistics are the SUMS of the per-group ones, so the two levels
    can never disagree on the data they describe.

    Scale shape: one fact-dim broadcast join, one map-side-combined
    groupBy to |brands| statistic rows, closed-form arithmetic on that
    tiny frame."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    q = li.join(
        F.broadcast(pt), F.col("p_partkey") == F.col("l_partkey")
    ).select(
        F.col("p_brand").alias("g"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("y"),
    )
    s = q.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def _corr(df: DataFrame) -> F.Column:
        n = F.col("n").cast("double")
        num = n * F.col("sxy").cast("double") - F.col("sx").cast(
            "double"
        ) * F.col("sy").cast("double")
        vx = n * F.col("sxx").cast("double") - F.col("sx").cast(
            "double"
        ) * F.col("sx").cast("double")
        vy = n * F.col("syy").cast("double") - F.col("sy").cast(
            "double"
        ) * F.col("sy").cast("double")
        return F.round(num / F.nullif(F.sqrt(vx * vy), F.lit(0.0)), 6)

    c = s.select("g", "n", _corr(s).alias("r"))
    t = s.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
        F.sum("sxx").alias("sxx"),
        F.sum("syy").alias("syy"),
    )
    o = t.select(_corr(t).alias("r_all"), F.col("n").alias("n_total"))
    opp = F.col("r") * F.col("r_all") < 0
    return (
        c.crossJoin(F.broadcast(o))
        .groupBy("r_all", "n_total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(opp, 1).otherwise(0))
            .cast("long")
            .alias("n_opposite_sign"),
            F.sum(F.when(opp, F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_in_opposite"),
        )
        .select(
            F.col("r_all").alias("overall_corr"),
            "n_groups",
            "n_opposite_sign",
            "rows_in_opposite",
            (F.col("rows_in_opposite") * 2 > F.col("n_total")).alias(
                "paradox"
            ),
        )
    )


# --- cross-correlation between two daily series ---------------------------------

_CCF_A, _CCF_B = "click", "purchase"
_CCF_MAX_LAG = 3


@register(
    "ccf_click_purchase",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events WHERE event_type IN ('{_CCF_A}', '{_CCF_B}')
    ),
    d AS (
      SELECT day, event_type, sum(vu) AS s, count(*) AS n
      FROM e GROUP BY 1, 2
    ),
    a AS (SELECT day, CAST(round(s * 1e3 / n) AS BIGINT) AS xu
          FROM d WHERE event_type = '{_CCF_A}'),
    b AS (SELECT day, CAST(round(s * 1e3 / n) AS BIGINT) AS yu
          FROM d WHERE event_type = '{_CCF_B}'),
    lags AS (SELECT unnest(range(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG + 1}))
               AS lag),
    p AS (
      SELECT l.lag, a.xu, b.yu
      FROM lags l
      JOIN a ON TRUE
      JOIN b ON b.day = a.day + to_days(CAST(l.lag AS INTEGER))
    ),
    s AS (
      SELECT lag, count(*) AS n, sum(xu) AS sx, sum(yu) AS sy,
             sum(xu * yu) AS sxy, sum(xu * xu) AS sxx, sum(yu * yu) AS syy
      FROM p GROUP BY 1
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / NULLIF(sqrt((CAST(n AS DOUBLE) * sxx
                                - CAST(sx AS DOUBLE) * sx)
                               * (CAST(n AS DOUBLE) * syy
                                  - CAST(sy AS DOUBLE) * sy)), 0), 6)
             AS ccf
    FROM s
    """,
)
def ccf_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily mean-value series
    of '{_CCF_A}' and '{_CCF_B}' at lags -{_CCF_MAX_LAG}..{_CCF_MAX_LAG}
    — the lead/lag diagnostic ACF/PACF can't answer: does one series
    MOVE BEFORE the other (peak at a nonzero lag = predictive lead,
    the thing a forecaster or causal analysis reaches for first).
    Daily means are re-quantized to micro-unit integers before the
    lagged pairing, so every per-lag Pearson runs on exact integer
    sufficient statistics; day pairing is calendar DATE arithmetic.

    Scale shape: one map-side-combined daily rollup; the lag
    cross-join and the per-lag statistics run on the |days| frame."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_CCF_A, _CCF_B))
        .select(
            ts_to_date("ts").alias("day"),
            "event_type",
            F.round(F.col("value") * 1e3).cast("long").alias("vu"),
        )
    )
    d = ev.groupBy("day", "event_type").agg(
        F.sum("vu").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mu = F.round(F.col("s") * 1e3 / F.col("n")).cast("long")
    a = d.filter(F.col("event_type") == _CCF_A).select(
        F.col("day").alias("da"), mu.alias("xu")
    )
    b = d.filter(F.col("event_type") == _CCF_B).select(
        F.col("day").alias("db"), mu.alias("yu")
    )
    lags = spark.range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    p = (
        lags.crossJoin(a)
        .join(
            b,
            F.col("db") == F.date_add(F.col("da"), F.col("lag")),
        )
        .select("lag", "xu", "yu")
    )
    s = p.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xu").alias("sx"),
        F.sum("yu").alias("sy"),
        F.sum(F.col("xu") * F.col("yu")).alias("sxy"),
        F.sum(F.col("xu") * F.col("xu")).alias("sxx"),
        F.sum(F.col("yu") * F.col("yu")).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    vy = n * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        F.round(num / F.nullif(F.sqrt(vx * vy), F.lit(0.0)), 6).alias(
            "ccf"
        ),
    )


# --- functional-dependency audit -------------------------------------------------

_FD_CANDIDATES = [
    # (name, table, determinant, dependent)
    ("nation_to_region", "nation", "n_nationkey", "n_regionkey"),
    ("cust_nation_to_segment", "customer", "c_nationkey", "c_mktsegment"),
    ("order_cust_to_priority", "orders", "o_custkey", "o_orderpriority"),
    ("line_order_to_supp", "lineitem", "l_orderkey", "l_suppkey"),
]


def _fd_oracle() -> str:
    branches = []
    for name, tbl, det, dep in _FD_CANDIDATES:
        branches.append(f"""
        SELECT '{name}' AS fd,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violating_keys,
               CAST(max(nd) AS BIGINT) AS max_distinct,
               (max(nd) = 1) AS holds
        FROM (SELECT {det} AS k, count(DISTINCT {dep}) AS nd
              FROM {tbl} GROUP BY 1)
        """)
    return " UNION ALL ".join(branches)


@register("functional_dependency_audit", oracle=_fd_oracle())
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over candidate determinant ->
    dependent pairs: per candidate, how many determinant values map to
    MORE than one dependent value (zero = the FD holds; the schema
    really is normalized on that path). This is the profiling pass
    schema-discovery and normalization tools run, and the data-quality
    gate for "this column should be derivable" assumptions — the
    complement of `fk_integrity_audit`'s inclusion checks. All counts
    are exact integers.

    Scale shape: per candidate one map-side-combined
    groupBy(determinant).countDistinct(dependent) and a 1-row summary
    — dependent cardinality per key is bounded, so partial aggregation
    carries tiny state."""
    out = None
    for name, tbl, det, dep in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        g = t.groupBy(F.col(det).alias("k")).agg(
            F.countDistinct(dep).alias("nd")
        )
        row = g.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_keys"),
            F.max("nd").cast("long").alias("max_distinct"),
            (F.max("nd") == 1).alias("holds"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# --- out-of-orderness audit (watermark design) -----------------------------------

_OOO_THRESH_S = (600, 3600)  # lateness thresholds: 10 min, 1 h


@register(
    "out_of_order_audit",
    oracle=f"""
    WITH e AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             hour(ts) * 3600 + minute(ts) * 60
               + CAST(floor(second(ts)) AS BIGINT) AS ssm,
             event_id
      FROM events
    ),
    l AS (
      SELECT day,
             greatest(max(ssm) OVER (PARTITION BY day
                                     ORDER BY event_id ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) - ssm, 0) AS late_s
      FROM e
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(late_s) AS BIGINT) AS max_late_s,
           round(sum(late_s) * 1e0 / count(*), 6) AS mean_late_s,
           round(sum(CASE WHEN late_s > {_OOO_THRESH_S[0]} THEN 1 ELSE 0 END)
                 * 1e0 / count(*), 6) AS share_late_10m,
           round(sum(CASE WHEN late_s > {_OOO_THRESH_S[1]} THEN 1 ELSE 0 END)
                 * 1e0 / count(*), 6) AS share_late_1h
    FROM l GROUP BY 1
    """,
)
def out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit — the measurement a streaming watermark
    is DESIGNED from: treating event_id as arrival order, each event's
    lateness is how far its event time sits behind the running maximum
    event time already seen that day; the per-day lateness profile
    (max, mean, share beyond 10 min / 1 h) says what
    withWatermark("10 minutes") would actually drop before you deploy
    it. The streaming family assumes a watermark; this query is how
    you pick one from the batch history. Lateness is wall-clock field
    arithmetic (seconds-since-midnight), immune to session-timezone
    offsets.

    Scale shape: one shuffle on day for the running-max window (the
    arrival-order sort is partition-local), then a map-side-combined
    daily aggregate."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(ts_to_date("ts"), "yyyy-MM-dd").alias("day"),
        (
            F.hour("ts") * 3600
            + F.minute("ts") * 60
            + F.floor(F.second("ts")).cast("long")
        ).alias("ssm"),
        "event_id",
    )
    w = Window.partitionBy("day").orderBy(F.asc("event_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    l = ev.select(
        "day",
        F.greatest(
            F.max("ssm").over(w) - F.col("ssm"), F.lit(0)
        ).alias("late_s"),
    )
    return l.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("late_s").cast("long").alias("max_late_s"),
        F.round(F.sum("late_s") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
            "mean_late_s"
        ),
        F.round(
            F.sum(F.when(F.col("late_s") > _OOO_THRESH_S[0], 1).otherwise(0))
            * F.lit(1.0)
            / F.count(F.lit(1)),
            6,
        ).alias("share_late_10m"),
        F.round(
            F.sum(F.when(F.col("late_s") > _OOO_THRESH_S[1], 1).otherwise(0))
            * F.lit(1.0)
            / F.count(F.lit(1)),
            6,
        ).alias("share_late_1h"),
    )


# --- order-total reconciliation (finance-close audit) ---------------------------


@register(
    "order_total_reconciliation",
    oracle="""
    WITH r AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS tp_c,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                            * (1 + l.l_tax) * 100) AS BIGINT)) AS rc_c
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN rc_c <> tp_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatch,
           round(sum(CASE WHEN rc_c <> tp_c THEN 1 ELSE 0 END) * 1e0
                 / count(*), 6) AS mismatch_rate,
           round(sum(abs(rc_c - tp_c)) / 1e2 / count(*), 6)
             AS mean_abs_diff,
           round(max(abs(rc_c - tp_c)) / 1e2, 6) AS max_abs_diff
    FROM r
    """,
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-total reconciliation — the finance-close audit: recompute
    each order's total from its line items
    (sum of extendedprice*(1-discount)*(1+tax)) and compare against
    the stored o_totalprice at cent grain. Each LINE charge quantizes
    to cents BEFORE the order sum — ledger arithmetic, and the integer
    sum is partitioning-exact where a rounded double sum is not. On this synthetic data the
    answer is that NOTHING reconciles (the generator draws totalprice
    independently) — which is exactly what the audit exists to say
    out loud before anyone joins revenue to line grain. Comparison and
    aggregation run on cent-quantized integers.

    Scale shape: one fact-fact join on the order key (co-partitioned/
    bucketed at 100 TB), one map-side-combined per-order aggregate,
    one 1-row summary."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("tp_c"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    r = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                    * 100
                ).cast("long")
            ).alias("rc_c")
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    mism = F.col("rc_c") != F.col("tp_c")
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(mism, 1).otherwise(0)).cast("long").alias("n_mismatch"),
        F.round(
            F.sum(F.when(mism, 1).otherwise(0)) * F.lit(1.0)
            / F.count(F.lit(1)),
            6,
        ).alias("mismatch_rate"),
        F.round(
            F.sum(F.abs(F.col("rc_c") - F.col("tp_c")))
            / F.lit(1e2)
            / F.count(F.lit(1)),
            6,
        ).alias("mean_abs_diff"),
        F.round(
            F.max(F.abs(F.col("rc_c") - F.col("tp_c"))) / F.lit(1e2), 6
        ).alias("max_abs_diff"),
    )


# --- leave-one-out target encoding ------------------------------------------------

_TE_SMOOTH = 20  # pseudo-observations pulled toward the global prior
_TE_TOPK = 50    # rows reported (full encoding is corpus-sized)


@register(
    "target_encode_loo",
    oracle=f"""
    WITH q AS (
      SELECT c_custkey, c_mktsegment AS g,
             CAST(round(c_acctbal * 100) AS BIGINT) AS y
      FROM customer
    ),
    gs AS (SELECT g, count(*) AS n, sum(y) AS s FROM q GROUP BY 1),
    t AS (SELECT count(*) AS n, sum(y) AS s FROM q)
    SELECT q.c_custkey, q.g AS segment,
           round((gs.s - q.y + {_TE_SMOOTH}e0 * t.s / t.n)
                 / (gs.n - 1 + {_TE_SMOOTH}) / 1e2, 6) AS te_loo
    FROM q JOIN gs USING (g) CROSS JOIN t
    ORDER BY q.c_custkey LIMIT {_TE_TOPK}
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the market segment against
    account balance — the categorical-feature encoder gradient-boosting
    pipelines ship everywhere: each row's encoding is its CATEGORY's
    target mean computed WITHOUT the row itself (the leakage guard) and
    smoothed toward the global prior by {_TE_SMOOTH} pseudo-counts (the
    rare-category guard). The whole encoder is one categorical-stats
    broadcast back onto the rows: (sum_g - y_i + m*prior) /
    (n_g - 1 + m), all from exact cent-unit integers.

    Scale shape: one map-side-combined per-category aggregate
    (|categories| rows) + a 1-row global, both broadcast into a pure
    projection over the fact — the encoding never shuffles the data it
    encodes. Output capped at {_TE_TOPK} rows for the report; the
    transform itself is corpus-sized by design."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("y"),
    )
    gs = cust.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    t = cust.agg(F.count(F.lit(1)).alias("tn"), F.sum("y").alias("ts"))
    prior = F.col("ts") * F.lit(1.0) / F.col("tn")
    return (
        cust.join(F.broadcast(gs), "g")
        .crossJoin(F.broadcast(t))
        .select(
            "c_custkey",
            F.col("g").alias("segment"),
            F.round(
                (F.col("s") - F.col("y") + F.lit(float(_TE_SMOOTH)) * prior)
                / (F.col("n") - 1 + _TE_SMOOTH)
                / F.lit(1e2),
                6,
            ).alias("te_loo"),
        )
        .orderBy("c_custkey")
        .limit(_TE_TOPK)
    )


# --- Weight of Evidence / Information Value binning --------------------------------

_WOE_BINS = 10
_WOE_EPS = "0.5"  # Laplace smoothing per bin side


@register(
    "woe_iv_value_bins",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS bad,
             CAST(round(avg(value) * 1e3) AS BIGINT) AS vu
      FROM events GROUP BY 1
    ),
    mm AS (SELECT min(vu) AS lo, max(vu) AS hi FROM u),
    b AS (
      SELECT least((vu - lo) * {_WOE_BINS} // (hi - lo + 1),
                   {_WOE_BINS - 1}) AS bin,
             bad
      FROM u CROSS JOIN mm
    ),
    g AS (
      SELECT bin, count(*) AS n, sum(bad) AS nb,
             count(*) - sum(bad) AS ng
      FROM b GROUP BY 1
    ),
    t AS (SELECT sum(nb) AS tb, sum(ng) AS tg FROM g)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
           CAST(nb AS BIGINT) AS n_bad,
           round(ln(((ng + {_WOE_EPS}e0) / (tg + {_WOE_EPS}e0 * {_WOE_BINS}))
                    / ((nb + {_WOE_EPS}e0)
                       / (tb + {_WOE_EPS}e0 * {_WOE_BINS}))), 6) AS woe,
           round((((ng + {_WOE_EPS}e0) / (tg + {_WOE_EPS}e0 * {_WOE_BINS}))
                  - ((nb + {_WOE_EPS}e0) / (tb + {_WOE_EPS}e0 * {_WOE_BINS})))
                 * ln(((ng + {_WOE_EPS}e0)
                       / (tg + {_WOE_EPS}e0 * {_WOE_BINS}))
                      / ((nb + {_WOE_EPS}e0)
                         / (tb + {_WOE_EPS}e0 * {_WOE_BINS}))), 6)
             AS iv_term
    FROM g CROSS JOIN t
    """,
)
def woe_iv_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value binning — the
    credit-scorecard feature screen: users binned by mean event value
    on a {_WOE_BINS}-bin equal-width grid, per bin the smoothed
    WOE = ln(P(bin|good)/P(bin|bad)) against the conversion label
    (high-value purchase) and the IV term whose sum grades the
    feature (rule of thumb: < 0.02 useless, > 0.3 strong). Laplace
    +{_WOE_EPS} per bin side keeps empty cells finite, identically in
    both engines; bin edges are integer arithmetic on milli-unit
    means.

    Scale shape: one per-user aggregate (the only data shuffle), a
    2-value min/max broadcast, one map-side-combined bin aggregate,
    arithmetic on {_WOE_BINS} rows."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("bad"),
        F.round(F.avg("value") * 1e3).cast("long").alias("vu"),
    )
    mm = u.agg(F.min("vu").alias("lo"), F.max("vu").alias("hi"))
    b = u.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.expr(f"((vu - lo) * {_WOE_BINS}) div (hi - lo + 1)"),
            F.lit(_WOE_BINS - 1).cast("long"),
        ).alias("bin"),
        "bad",
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bad").alias("nb"),
        (F.count(F.lit(1)) - F.sum("bad")).alias("ng"),
    )
    t = g.agg(F.sum("nb").alias("tb"), F.sum("ng").alias("tg"))
    eps = float(_WOE_EPS)
    pg = (F.col("ng") + eps) / (F.col("tg") + eps * _WOE_BINS)
    pb = (F.col("nb") + eps) / (F.col("tb") + eps * _WOE_BINS)
    woe = F.log(pg / pb)
    return g.crossJoin(F.broadcast(t)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.col("nb").cast("long").alias("n_bad"),
        F.round(woe, 6).alias("woe"),
        F.round((pg - pb) * woe, 6).alias("iv_term"),
    )


# --- Kendall's tau between the click and purchase daily series --------------------


@register(
    "kendall_tau_daily",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events WHERE event_type IN ('{_CCF_A}', '{_CCF_B}')
    ),
    d AS (
      SELECT day, event_type, CAST(round(sum(vu) * 1e3 / count(*)) AS BIGINT)
               AS mu
      FROM e GROUP BY 1, 2
    ),
    p AS (
      SELECT a.day, a.mu AS x, b.mu AS y
      FROM d a JOIN d b ON b.day = a.day
      WHERE a.event_type = '{_CCF_A}' AND b.event_type = '{_CCF_B}'
    ),
    pr AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1
                  WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN -1
                  ELSE 0 END AS s
      FROM p a JOIN p b ON a.day < b.day
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS concordant,
           CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS discordant,
           round(sum(s) * 1e0 / count(*), 6) AS kendall_tau
    FROM pr
    """,
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau between the '{_CCF_A}' and '{_CCF_B}' daily mean
    series: the RANK association (concordant minus discordant day
    pairs over all pairs) — the robust companion of
    `ccf_click_purchase`'s lag-0 Pearson: immune to outlier days and
    to any monotone rescaling of either series. Daily means quantize
    to integers, so concordance is exact sign arithmetic; the O(days^2)
    pair loop runs on the |days| frame, never the events.

    Scale shape: one map-side-combined daily rollup, then arithmetic
    on a <= |days|^2/2 pair frame of the TINY daily table."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_CCF_A, _CCF_B))
        .select(
            ts_to_date("ts").alias("day"),
            "event_type",
            F.round(F.col("value") * 1e3).cast("long").alias("vu"),
        )
    )
    d = ev.groupBy("day", "event_type").agg(
        F.round(F.sum("vu") * 1e3 / F.count(F.lit(1)))
        .cast("long")
        .alias("mu")
    )
    a = d.filter(F.col("event_type") == _CCF_A).select(
        F.col("day").alias("da"), F.col("mu").alias("x")
    )
    b = d.filter(F.col("event_type") == _CCF_B).select(
        F.col("day").alias("db"), F.col("mu").alias("y")
    )
    p = a.join(b, F.col("db") == F.col("da")).select(
        F.col("da").alias("day"), "x", "y"
    )
    l = p.select(
        F.col("day").alias("d1"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    r = p.select(
        F.col("day").alias("d2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    prod = (F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2"))
    pr = l.join(r, F.col("d1") < F.col("d2")).select(
        F.when(prod > 0, 1).when(prod < 0, -1).otherwise(0).alias("s")
    )
    return pr.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("long")
        .alias("concordant"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("long")
        .alias("discordant"),
        F.round(F.sum("s") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
            "kendall_tau"
        ),
    )


# --- Wald-Wolfowitz runs test on daily changes -------------------------------------


@register(
    "runs_test_daily",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    d AS (
      SELECT day, CAST(round(sum(vu) * 1e3 / count(*)) AS BIGINT) AS mu
      FROM e GROUP BY 1
    ),
    df AS (
      SELECT day, mu - lag(mu) OVER (ORDER BY day) AS diff FROM d
    ),
    sg AS (
      SELECT day, CASE WHEN diff > 0 THEN 1 ELSE 0 END AS s
      FROM df WHERE diff IS NOT NULL AND diff <> 0
    ),
    rn AS (
      SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                     OR lag(s) OVER (ORDER BY day) <> s
                THEN 1 ELSE 0 END AS new_run
      FROM sg
    ),
    st AS (
      SELECT count(*) AS n, sum(s) AS np, count(*) - sum(s) AS nm,
             sum(new_run) AS runs
      FROM rn
    )
    SELECT CAST(n AS BIGINT) AS n_changes, CAST(np AS BIGINT) AS n_up,
           CAST(nm AS BIGINT) AS n_down, CAST(runs AS BIGINT) AS n_runs,
           round(1e0 + 2e0 * np * nm / n, 6) AS expected_runs,
           round((runs - (1e0 + 2e0 * np * nm / n))
                 / NULLIF(sqrt((2e0 * np * nm * (2e0 * np * nm - n))
                               / (CAST(n AS DOUBLE) * n * (n - 1))), 0), 6)
             AS z_score
    FROM st
    """,
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the SIGNS of day-over-day changes of
    the daily mean-value series: too FEW runs of consecutive ups/downs
    means the series trends or sticks (autocorrelation), too MANY means
    oscillation — the classic randomness check that complements
    Mann-Kendall (which only sees monotone trend). Zero-change days are
    dropped (the standard treatment); counts are exact integers and the
    normal-approximation z uses fixed-operand IEEE arithmetic.

    Scale shape: one map-side-combined daily rollup; the sign/run
    windows and the closed form run on the |days| frame."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        ts_to_date("ts").alias("day"),
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
    )
    d = ev.groupBy("day").agg(
        F.round(F.sum("vu") * 1e3 / F.count(F.lit(1)))
        .cast("long")
        .alias("mu")
    )
    wo = Window.orderBy("day")
    df = d.select(
        "day", (F.col("mu") - F.lag("mu").over(wo)).alias("diff")
    ).filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
    sg = df.select(
        "day", F.when(F.col("diff") > 0, 1).otherwise(0).alias("s")
    )
    rn = sg.select(
        "s",
        F.when(
            F.lag("s").over(wo).isNull() | (F.lag("s").over(wo) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    st = rn.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("np"),
        (F.count(F.lit(1)) - F.sum("s")).alias("nm"),
        F.sum("new_run").alias("runs"),
    )
    n = F.col("n").cast("double")
    np_, nm = F.col("np").cast("double"), F.col("nm").cast("double")
    exp_runs = F.lit(1.0) + F.lit(2.0) * np_ * nm / n
    var = (F.lit(2.0) * np_ * nm * (F.lit(2.0) * np_ * nm - n)) / (
        n * n * (n - 1)
    )
    return st.select(
        F.col("n").cast("long").alias("n_changes"),
        F.col("np").cast("long").alias("n_up"),
        F.col("nm").cast("long").alias("n_down"),
        F.col("runs").cast("long").alias("n_runs"),
        F.round(exp_runs, 6).alias("expected_runs"),
        F.round(
            (F.col("runs") - exp_runs)
            / F.nullif(F.sqrt(var), F.lit(0.0)),
            6,
        ).alias("z_score"),
    )


# --- post-hoc pairwise mean differences (after the ANOVA) ---------------------------


@register(
    "pairwise_mean_diffs",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    g AS (
      SELECT event_type, count(*) AS n, sum(vu) AS s, sum(vu * vu) AS ss
      FROM q GROUP BY 1
    ),
    t AS (
      SELECT sum(n) AS n, count(*) AS k,
             sum(ss) - sum(CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT))
               AS ssw
      FROM g
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round((a.s * 1e0 / a.n - b.s * 1e0 / b.n) / 1e3, 6) AS mean_diff,
           round(((a.s * 1e0 / a.n - b.s * 1e0 / b.n) / 1e3)
                 / sqrt((t.ssw / 1e6 / (t.n - t.k))
                        * (1e0 / a.n + 1e0 / b.n)), 6) AS t_stat
    FROM g a JOIN g b ON a.event_type < b.event_type CROSS JOIN t
    """,
)
def pairwise_mean_diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc pairwise comparisons after `anova_value_by_type`: for
    every pair of event types, the mean difference and its t statistic
    against the POOLED within-group variance (the Fisher-LSD /
    Tukey-numerator form) — the ANOVA says SOME group differs; this
    table says WHICH pairs. The pooled SSW reuses the ANOVA's
    re-quantized integer trick, so the shared denominator is
    partitioning-exact and every pair's statistic derives from the
    same |types|-row sufficient-statistics frame.

    Scale shape: the identical single map-side-combined aggregate as
    the ANOVA; the pair expansion is a self-join of the tiny group
    frame."""
    q = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 1e3).cast("long").alias("vu")
    )
    g = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vu").alias("s"),
        F.sum(F.col("vu") * F.col("vu")).alias("ss"),
    )
    t = g.agg(
        F.sum("n").alias("tn"),
        F.count(F.lit(1)).alias("k"),
        (
            F.sum("ss")
            - F.sum(
                F.round(
                    F.col("s").cast("double") * F.col("s") / F.col("n")
                ).cast("long")
            )
        ).alias("ssw"),
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    md = (
        F.col("sa") * F.lit(1.0) / F.col("na")
        - F.col("sb") * F.lit(1.0) / F.col("nb")
    ) / F.lit(1e3)
    se = F.sqrt(
        (F.col("ssw") / F.lit(1e6) / (F.col("tn") - F.col("k")))
        * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(t))
        .select(
            "type_a",
            "type_b",
            F.round(md, 6).alias("mean_diff"),
            F.round(md / se, 6).alias("t_stat"),
        )
    )


# --- Brown-Forsythe variance-homogeneity test ---------------------------------------


@register(
    "levene_brown_forsythe",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(round(value * 1e3) AS BIGINT) AS vu,
             event_id
      FROM events
    ),
    r AS (
      SELECT event_type, vu,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY vu ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM q
    ),
    med AS (
      SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN vu END) AS m
      FROM r GROUP BY 1
    ),
    z AS (
      SELECT q.event_type, abs(q.vu - med.m) AS zu
      FROM q JOIN med USING (event_type)
    ),
    g AS (
      SELECT event_type, count(*) AS ng, sum(zu) AS sg, sum(zu * zu) AS ssg
      FROM z GROUP BY 1
    ),
    t AS (
      SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s, sum(ssg) AS ss,
             sum(CAST(round(CAST(sg AS DOUBLE) * sg / ng) AS BIGINT)) AS st
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n_rows,
           round(((st - CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT))
                  * 1e0 / (k - 1))
                 / ((ss - st) * 1e0 / (n - k)), 6) AS bf_stat
    FROM t
    """,
)
def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene with MEDIAN centers) for variance
    homogeneity across event types: an ANOVA on the absolute deviations
    |x - group median| — the assumption check that decides whether the
    pooled-variance machinery of `anova_value_by_type` and
    `pairwise_mean_diffs` is even valid, and itself the robust
    answer to "did the SPREAD change", which mean-based monitors miss.
    Group medians are rank-selected lower medians under the
    (value, event_id) total order (exact and deterministic); the
    deviations are exact integers, and the F arithmetic reuses the
    ANOVA's re-quantization trick.

    Scale shape: one rank window per type (the exact-quantile shuffle
    the engine already pays elsewhere), one deviation projection, one
    map-side-combined |types|-row aggregate."""
    from pyspark.sql import Window

    q = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
        "event_id",
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.asc("vu"), F.asc("event_id")
    )
    wn = Window.partitionBy("event_type")
    r = q.select(
        "event_type",
        "vu",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        r.filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("vu").alias("m"))
    )
    z = q.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("vu") - F.col("m")).alias("zu")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("zu").alias("sg"),
        F.sum(F.col("zu") * F.col("zu")).alias("ssg"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("ssg").alias("ss"),
        F.sum(
            F.round(
                F.col("sg").cast("double") * F.col("sg") / F.col("ng")
            ).cast("long")
        ).alias("st"),
    )
    ssb = F.col("st") - F.round(
        F.col("s").cast("double") * F.col("s") / F.col("n")
    ).cast("long")
    ssw = F.col("ss") - F.col("st")
    return t.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(
            (ssb * F.lit(1.0) / (F.col("k") - 1))
            / (ssw * F.lit(1.0) / (F.col("n") - F.col("k"))),
            6,
        ).alias("bf_stat"),
    )


# --- Spearman rank correlation between the daily series -----------------------------


@register(
    "spearman_rho_daily",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events WHERE event_type IN ('{_CCF_A}', '{_CCF_B}')
    ),
    d AS (
      SELECT day, event_type,
             CAST(round(sum(vu) * 1e3 / count(*)) AS BIGINT) AS mu
      FROM e GROUP BY 1, 2
    ),
    p AS (
      SELECT a.day, a.mu AS x, b.mu AS y
      FROM d a JOIN d b ON b.day = a.day
      WHERE a.event_type = '{_CCF_A}' AND b.event_type = '{_CCF_B}'
    ),
    r AS (
      SELECT row_number() OVER (ORDER BY x ASC, day ASC) AS rx,
             row_number() OVER (ORDER BY y ASC, day ASC) AS ry
      FROM p
    ),
    s AS (
      SELECT count(*) AS n, sum((rx - ry) * (rx - ry)) AS d2 FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(1e0 - 6e0 * d2 / (CAST(n AS DOUBLE) * (n * 1e0 * n - 1)),
                 6) AS spearman_rho
    FROM s
    """,
)
def spearman_rho_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the '{_CCF_A}' and
    '{_CCF_B}' daily mean series via the classic 1 - 6*sum(d^2)/
    (n(n^2-1)) formula — the third member of the correlation set
    (Pearson CCF for linear lead/lag, Kendall for pairwise
    concordance, Spearman for monotone association). Ranks come from
    row_number over the integer-quantized means with a day tie-break,
    so d^2 is exact integer arithmetic; ties are broken identically in
    both engines rather than midranked (documented choice — the
    quantized means collide rarely, and a deterministic total order
    beats an engine-varying midrank).

    Scale shape: one daily rollup; ranking windows run on the |days|
    frame."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_CCF_A, _CCF_B))
        .select(
            ts_to_date("ts").alias("day"),
            "event_type",
            F.round(F.col("value") * 1e3).cast("long").alias("vu"),
        )
    )
    d = ev.groupBy("day", "event_type").agg(
        F.round(F.sum("vu") * 1e3 / F.count(F.lit(1)))
        .cast("long")
        .alias("mu")
    )
    a = d.filter(F.col("event_type") == _CCF_A).select(
        F.col("day").alias("da"), F.col("mu").alias("x")
    )
    b = d.filter(F.col("event_type") == _CCF_B).select(
        F.col("day").alias("db"), F.col("mu").alias("y")
    )
    p = a.join(b, F.col("db") == F.col("da")).select(
        F.col("da").alias("day"), "x", "y"
    )
    r = p.select(
        F.row_number()
        .over(Window.orderBy(F.asc("x"), F.asc("day")))
        .alias("rx"),
        F.row_number()
        .over(Window.orderBy(F.asc("y"), F.asc("day")))
        .alias("ry"),
    )
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
        ).alias("d2"),
    )
    n = F.col("n").cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(
            F.lit(1.0)
            - F.lit(6.0) * F.col("d2") / (n * (n * F.lit(1.0) * n - 1)),
            6,
        ).alias("spearman_rho"),
    )


# --- position-based (U-shaped) multi-touch attribution -------------------------------


@register(
    "attribution_position_based",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events WHERE event_type = 'purchase'
    ),
    np AS (
      SELECT user_id, event_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'
    ),
    j AS (
      SELECT p.event_id AS p_id, p.vc, np.event_type AS channel,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY np.ts ASC, np.event_id ASC) AS rn,
             count(*) OVER (PARTITION BY p.event_id) AS k
      FROM p JOIN np ON np.user_id = p.user_id
        AND (np.ts < p.ts OR (np.ts = p.ts AND np.event_id < p.event_id))
    ),
    c AS (
      SELECT p_id, vc, channel,
             CASE WHEN k = 1 THEN 1000000
                  WHEN k = 2 THEN 500000
                  WHEN rn = 1 OR rn = k THEN 400000
                  WHEN rn = k - 1
                  THEN 200000 // (k - 2) + 200000 % (k - 2)
                  ELSE 200000 // (k - 2) END AS ppm
      FROM j
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           round(sum(ppm * vc) / 1e6 / 1e2, 6) AS attributed_value,
           round(sum(ppm) / 1e6, 6) AS attributed_conversions
    FROM c GROUP BY 1
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the
    standard middle ground between the bookend models of
    `attribution_first_last_touch`: 40% credit to the first touch,
    40% to the last, 20% split across the middles (100% / 50-50 for
    1- and 2-touch paths). Credits are EXACT integer parts-per-million
    that provably sum to 1e6 per conversion — the middle split uses
    integer div with the remainder assigned to the last middle touch,
    a documented deterministic convention — so attributed value is an
    exact integer sum of ppm x cents and total credited conversions
    reconcile to the purchase count by construction.

    Scale shape: the same user-key join and per-purchase rank windows
    as the bookend models; credit assignment is a pure projection;
    one map-side-combined per-channel reduce."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    np_ = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    j = (
        p.join(np_, "user_id")
        .filter(
            (F.col("t_ts") < F.col("p_ts"))
            | (
                (F.col("t_ts") == F.col("p_ts"))
                & (F.col("t_id") < F.col("p_id"))
            )
        )
        .select(
            "p_id",
            "vc",
            "channel",
            F.row_number()
            .over(
                Window.partitionBy("p_id").orderBy(
                    F.asc("t_ts"), F.asc("t_id")
                )
            )
            .alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("p_id"))
            .alias("k"),
        )
    )
    ppm = (
        F.when(F.col("k") == 1, 1000000)
        .when(F.col("k") == 2, 500000)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), 400000)
        .when(
            F.col("rn") == F.col("k") - 1,
            F.expr("200000 div (k - 2) + 200000 % (k - 2)"),
        )
        .otherwise(F.expr("200000 div (k - 2)"))
    )
    c = j.select("channel", "vc", ppm.alias("ppm"))
    return c.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.round(
            F.sum(F.col("ppm") * F.col("vc")) / F.lit(1e6) / F.lit(1e2), 6
        ).alias("attributed_value"),
        F.round(F.sum("ppm") / F.lit(1e6), 6).alias(
            "attributed_conversions"
        ),
    )


# --- spatial epsilon-neighbor join on a grid index -----------------------------------

_GEO_SEED = "geo-v1"
_GEO_EXTENT = 1_000_000   # coordinate space: [0, 1e6) micro-units square
_GEO_EPS = 60_000         # neighbor radius (6% of extent) = grid cell size
# (6% keeps the sf0.01 plane dense enough that DBSCAN cores exist —
# at 2% the 150-point plane had max 1 neighbor per point)
_GEO_TOPK = 40


@register(
    "spatial_neighbor_join",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    pt AS (
      SELECT user_id,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GEO_SEED + '-x')} % {_GEO_EXTENT} AS x,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GEO_SEED + '-y')} % {_GEO_EXTENT} AS y
      FROM u
    ),
    cells AS (
      SELECT user_id, x, y, x // {_GEO_EPS} AS cx, y // {_GEO_EPS} AS cy
      FROM pt
    ),
    probe AS (
      SELECT c.user_id, c.x, c.y,
             c.cx + dx.d AS px, c.cy + dy.d AS py
      FROM cells c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    ),
    cand AS (
      SELECT a.user_id AS id_a, b.user_id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM probe a JOIN cells b
        ON b.cx = a.px AND b.cy = a.py AND a.user_id < b.user_id
    )
    SELECT id_a, id_b, CAST(d2 AS BIGINT) AS d2,
           round(sqrt(CAST(d2 AS DOUBLE)) / {_GEO_EXTENT}e0, 6) AS dist
    FROM cand WHERE d2 <= {_GEO_EPS * _GEO_EPS}
    ORDER BY d2 ASC, id_a ASC, id_b ASC LIMIT {_GEO_TOPK}
    """,
)
def spatial_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial epsilon-neighbor join — the grid-index primitive behind
    every distributed spatial engine (GeoSpark/Sedona partitioning,
    DBSCAN's region query, geohash proximity): points live on an
    integer micro-unit plane (deterministic per-user hash coordinates
    — the engine's stand-in for real lat/lon), the grid cell size
    EQUALS the radius so every true neighbor pair shares a cell or an
    adjacent one, and candidates come from a 9-offset cell equi-join
    (one side replicated 9x) — never the all-pairs cross join.
    Distances compare as exact integer d2; the closest
    {_GEO_TOPK} pairs are reported.

    Scale shape: candidate generation is an equi-join on cell keys
    with constant (9x) replication — at 100 TB the cell id is the
    shuffle/partition key and skewed cells (cities) get the same
    salting treatment as any hot key; the verify filter and top-K heap
    bound the output."""
    u = load_table(spark, sf_dir, "events").select("user_id").distinct()
    x = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-x")
    y = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-y")
    pt = u.select(
        "user_id",
        (x % _GEO_EXTENT).alias("x"),
        (y % _GEO_EXTENT).alias("y"),
    )
    cells = pt.select(
        "user_id", "x", "y",
        F.expr(f"x div {_GEO_EPS}").alias("cx"),
        F.expr(f"y div {_GEO_EPS}").alias("cy"),
    )
    offsets = local_df(
        # pure-JVM literal (r15): createDataFrame(py_list) builds a
        # Python-RDD-backed plan that launches Python workers on every
        # execution of the broadcast build (see schemas.local_df)
        spark,
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx int, dy int",
    )
    probe = cells.crossJoin(F.broadcast(offsets)).select(
        F.col("user_id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.col("cx") + F.col("dx")).alias("px"),
        (F.col("cy") + F.col("dy")).alias("py"),
    )
    b = cells.select(
        F.col("user_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    cand = (
        probe.join(
            b,
            (F.col("bcx") == F.col("px"))
            & (F.col("bcy") == F.col("py"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", d2.alias("d2"))
        .filter(F.col("d2") <= _GEO_EPS * _GEO_EPS)
    )
    return (
        cand.orderBy(F.asc("d2"), F.asc("id_a"), F.asc("id_b"))
        .limit(_GEO_TOPK)
        .select(
            "id_a",
            "id_b",
            F.col("d2").cast("long").alias("d2"),
            F.round(
                F.sqrt(F.col("d2").cast("double")) / F.lit(float(_GEO_EXTENT)),
                6,
            ).alias("dist"),
        )
    )


# --- Moran's I spatial autocorrelation of the density grid ----------------------------

_MORAN_G = 20  # lattice side: G x G cells over the hash plane


@register(
    "morans_i_density",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    pt AS (
      SELECT {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GEO_SEED + '-x')} % {_GEO_EXTENT} AS x,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GEO_SEED + '-y')} % {_GEO_EXTENT} AS y
      FROM u
    ),
    occ AS (
      SELECT x * {_MORAN_G} // {_GEO_EXTENT} AS cx,
             y * {_MORAN_G} // {_GEO_EXTENT} AS cy, count(*) AS c
      FROM pt GROUP BY 1, 2
    ),
    lat AS (
      SELECT gx.i AS cx, gy.i AS cy, coalesce(occ.c, 0) AS c
      FROM (SELECT unnest(range(0, {_MORAN_G})) AS i) gx
      CROSS JOIN (SELECT unnest(range(0, {_MORAN_G})) AS i) gy
      LEFT JOIN occ ON occ.cx = gx.i AND occ.cy = gy.i
    ),
    t AS (SELECT count(*) AS n, sum(c) AS s FROM lat),
    d AS (
      SELECT cx, cy, c * t.n - t.s AS du FROM lat CROSS JOIN t
    ),
    pr AS (
      SELECT a.du AS da, b.du AS db
      FROM d a JOIN d b
        ON (b.cx = a.cx + 1 AND b.cy = a.cy)
        OR (b.cx = a.cx AND b.cy = a.cy + 1)
    ),
    s AS (
      SELECT (SELECT count(*) FROM pr) AS w,
             (SELECT sum(da * db) FROM pr) AS num,
             (SELECT sum(du * du) FROM d) AS den,
             (SELECT n FROM t) AS n
    )
    SELECT CAST(n AS BIGINT) AS n_cells, CAST(w AS BIGINT) AS n_adjacencies,
           round(CAST(n AS DOUBLE) * num / (CAST(w AS DOUBLE) * den), 6)
             AS morans_i
    FROM s
    """,
)
def morans_i_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of point density over the
    {_MORAN_G}x{_MORAN_G} lattice (rook adjacency): do dense cells
    neighbor dense cells (clustering, I > 0) or sparse ones
    (dispersion, I < 0)? Near 0 here by construction — hash
    coordinates are uniform — which makes this the NULL-distribution
    calibration for the statistic, exactly what you want on record
    before pointing it at real coordinates. Empty cells participate
    (the lattice is materialized densely — a missing cell IS data);
    deviations are cross-multiplied to integers (du = c*N - S) so
    numerator and denominator are exact integer sums whose N^2
    factors cancel.

    Scale shape: one cell-count aggregate, a {_MORAN_G}^2-row lattice
    cross join, an adjacency self-join of that tiny frame."""
    u = load_table(spark, sf_dir, "events").select("user_id").distinct()
    x = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-x")
    y = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-y")
    occ = (
        u.select(
            (x % _GEO_EXTENT).alias("x"),
            (y % _GEO_EXTENT).alias("y"),
        )
        .select(
            F.expr(f"x * {_MORAN_G} div {_GEO_EXTENT}").alias("cx"),
            F.expr(f"y * {_MORAN_G} div {_GEO_EXTENT}").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gx = spark.range(_MORAN_G).select(F.col("id").alias("cx"))
    gy = spark.range(_MORAN_G).select(F.col("id").alias("cy"))
    lat = (
        gx.crossJoin(gy)
        .join(F.broadcast(occ), ["cx", "cy"], "left")
        .select(
            "cx", "cy", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    t = lat.agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
    d = lat.crossJoin(F.broadcast(t)).select(
        "cx", "cy", (F.col("c") * F.col("n") - F.col("s")).alias("du")
    )
    a = d.select(
        F.col("cx").alias("ax"), F.col("cy").alias("ay"), F.col("du").alias("da")
    )
    b = d.select(
        F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("du").alias("db")
    )
    pr = a.join(
        b,
        ((F.col("bx") == F.col("ax") + 1) & (F.col("by") == F.col("ay")))
        | ((F.col("bx") == F.col("ax")) & (F.col("by") == F.col("ay") + 1)),
    )
    num = pr.agg(
        F.count(F.lit(1)).alias("w"),
        F.sum(F.col("da") * F.col("db")).alias("num"),
    )
    den = d.agg(F.sum(F.col("du") * F.col("du")).alias("den"))
    return (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("n").cast("long").alias("n_cells"),
            F.col("w").cast("long").alias("n_adjacencies"),
            F.round(
                F.col("n").cast("double")
                * F.col("num")
                / (F.col("w").cast("double") * F.col("den")),
                6,
            ).alias("morans_i"),
        )
    )


# --- DBSCAN region query: core-point labeling ----------------------------------------

_DBSCAN_MINPTS = 3  # neighbors (excluding self) within eps to be "core"

# Per-CELL occupancy cap on the BUILD side of the epsilon cell join
# (r13, VERDICT r12 item 2). The r12 _DBSCAN_EDGECAP bounded what the
# consumers MATERIALIZE, but the candidate *stream* itself still did
# O(density²) CPU work: with a fixed coordinate extent, per-cell
# occupancy m grows linearly with the corpus and the cell equi-join
# emits Σ 9·m² candidate rows through the distance filter (visible at
# the third decade: 100x moved 68 -> 122 s when the probe dropped its
# split override — pure candidate-stream CPU). The build side of the
# join therefore keeps only the _DBSCAN_CELLCAP smallest-user_id
# points per (cx, cy) cell (deterministic, the
# _OVL_BUCKCAP/_FUZ_BUCKCAP fleet convention); every point still
# PROBES its 9 cells, so candidates are bounded at 9·cap·N — linear in
# corpus size no matter how dense the space gets. SEMANTIC (degree
# counts, core labels, edges and border attachment all see only
# capped-cell neighbors at scale), mirrored row-for-row in both
# oracles. Provided-testdata max cell occupancy is 12 (sf0.1, 284
# occupied cells / 1,500 points), so the 64 cap never binds there and
# all provided-sf results are byte-identical (regression-pinned
# DuckDB-only across sf0.001/0.01/0.1); the cap's bite at scale is
# recorded by tools/probe_scale100.py as this family's honesty
# metric.
_DBSCAN_CELLCAP = 64


@register(
    "dbscan_core_points",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    pt AS (
      SELECT user_id,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GEO_SEED + '-x')} % {_GEO_EXTENT} AS x,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GEO_SEED + '-y')} % {_GEO_EXTENT} AS y
      FROM u
    ),
    cells AS (
      SELECT user_id, x, y, x // {_GEO_EPS} AS cx, y // {_GEO_EPS} AS cy
      FROM pt
    ),
    bcells AS (
      SELECT user_id, x, y, cx, cy FROM (
        SELECT *, row_number() OVER (PARTITION BY cx, cy
                                     ORDER BY user_id ASC) AS crn
        FROM cells) WHERE crn <= {_DBSCAN_CELLCAP}
    ),
    probe AS (
      SELECT c.user_id, c.x, c.y, c.cx + dx.d AS px, c.cy + dy.d AS py
      FROM cells c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    ),
    nb AS (
      SELECT a.user_id, count(*) AS n_neighbors
      FROM probe a JOIN bcells b
        ON b.cx = a.px AND b.cy = a.py AND b.user_id <> a.user_id
       AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= {_GEO_EPS * _GEO_EPS}
      GROUP BY 1
    ),
    lab AS (
      SELECT pt.user_id, coalesce(nb.n_neighbors, 0) AS n_neighbors,
             coalesce(nb.n_neighbors, 0) >= {_DBSCAN_MINPTS} AS is_core
      FROM pt LEFT JOIN nb USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN is_core THEN 1 ELSE 0 END) AS BIGINT)
             AS n_core,
           CAST(sum(CASE WHEN NOT is_core AND n_neighbors > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_border_or_reachable,
           CAST(sum(CASE WHEN n_neighbors = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_isolated,
           CAST(max(n_neighbors) AS BIGINT) AS max_neighbors
    FROM lab
    """,
)
def dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN's region query, distributed: per point the count of
    epsilon-neighbors from the SAME grid-bucketed 9-cell probe as
    `spatial_neighbor_join`, labeling each point core
    (>= {_DBSCAN_MINPTS} neighbors), reachable (some neighbor), or
    isolated — everything in DBSCAN except the final core-graph
    connected components, which the engine already owns
    (`dedup_clusters_minhash`'s iterative CC over an edge list; feed
    it the core-core pairs and you have full DBSCAN). The summary row
    is the density profile a clustering run is tuned from.

    Scale shape: identical candidate generation to the neighbor join
    (constant 9x replication, cell-key equi-join), one
    map-side-combined per-point count, a left join back for isolated
    points, a 1-row reduce. r13: the build side keeps only
    _DBSCAN_CELLCAP smallest-id points per cell, so the candidate
    stream is 9·cap·N — linear in corpus size (the uncapped cell join
    did O(density²) CPU work; no bite on provided testdata, mirrored
    in the oracle)."""
    from pyspark.sql import Window

    u = load_table(spark, sf_dir, "events").select("user_id").distinct()
    x = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-x")
    y = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-y")
    pt = u.select(
        "user_id",
        (x % _GEO_EXTENT).alias("x"),
        (y % _GEO_EXTENT).alias("y"),
    )
    cells = pt.select(
        "user_id", "x", "y",
        F.expr(f"x div {_GEO_EPS}").alias("cx"),
        F.expr(f"y div {_GEO_EPS}").alias("cy"),
    )
    wcell = Window.partitionBy("cx", "cy").orderBy(F.asc("user_id"))
    bcells = (
        cells.withColumn("crn", F.row_number().over(wcell))
        .filter(F.col("crn") <= _DBSCAN_CELLCAP)
        .drop("crn")
    )
    offsets = local_df(
        # pure-JVM literal (r15): createDataFrame(py_list) builds a
        # Python-RDD-backed plan that launches Python workers on every
        # execution of the broadcast build (see schemas.local_df)
        spark,
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx int, dy int",
    )
    probe = cells.crossJoin(F.broadcast(offsets)).select(
        F.col("user_id").alias("ida"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.col("cx") + F.col("dx")).alias("px"),
        (F.col("cy") + F.col("dy")).alias("py"),
    )
    b = bcells.select(
        F.col("user_id").alias("idb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    nb = (
        probe.join(
            b,
            (F.col("bcx") == F.col("px"))
            & (F.col("bcy") == F.col("py"))
            & (F.col("ida") != F.col("idb")),
        )
        .filter(d2 <= _GEO_EPS * _GEO_EPS)
        .groupBy(F.col("ida").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
    lab = pt.join(nb, "user_id", "left").select(
        F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("nn")
    )
    core = F.col("nn") >= _DBSCAN_MINPTS
    return lab.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(F.when(core, 1).otherwise(0)).cast("long").alias("n_core"),
        F.sum(F.when(~core & (F.col("nn") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_border_or_reachable"),
        F.sum(F.when(F.col("nn") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_isolated"),
        F.max("nn").cast("long").alias("max_neighbors"),
    )


# --- full DBSCAN: clusters from the core graph ----------------------------------------

# Per-point adjacency cap for the epsilon graph (r12): with a FIXED
# coordinate extent, point density — and so per-point eps-degree —
# grows linearly with the corpus, and the materialized pair list grows
# quadratically (measured: 1,500 pts -> max degree 28; 150k pts at the
# 100x fixture -> ~1,700 expected degree, ~2.5e8 pair rows, which
# killed the 8g probe JVM on allocation churn). Every edge consumer is
# therefore truncated to each point's _DBSCAN_EDGECAP smallest-id
# eps-neighbors (after role filtering; deterministic, the
# _AA_MIDCAP/_OVL_BUCKCAP convention), and the core-merge edge list is
# explicitly SYMMETRIZED after capping (the cap breaks the pair list's
# natural both-directions symmetry, and min-label propagation needs
# undirected edges on both engines). Degree COUNTS (core detection)
# remain exact — counting streams through an aggregate without
# materializing pairs. Edges are then <= 2 x N x cap (linear), CC
# rounds unchanged. Max measured degree on provided testdata is 28
# (sf0.1), so the 64 cap never binds there and results are
# byte-identical; the cap's bite at scale is recorded by the 100x
# battery. Mirrored row-for-row in the oracle.
_DBSCAN_EDGECAP = 64


@register(
    "dbscan_clusters",
    oracle=f"""
    WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events),
    pt AS (
      SELECT user_id,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GEO_SEED + '-x')} % {_GEO_EXTENT} AS x,
             {X.token_hash_sql('CAST(user_id AS VARCHAR)', seed=_GEO_SEED + '-y')} % {_GEO_EXTENT} AS y
      FROM u
    ),
    cells AS (
      SELECT user_id, x, y, x // {_GEO_EPS} AS cx, y // {_GEO_EPS} AS cy
      FROM pt
    ),
    bcells AS (
      SELECT user_id, x, y, cx, cy FROM (
        SELECT *, row_number() OVER (PARTITION BY cx, cy
                                     ORDER BY user_id ASC) AS crn
        FROM cells) WHERE crn <= {_DBSCAN_CELLCAP}
    ),
    probe AS (
      SELECT c.user_id, c.x, c.y, c.cx + dx.d AS px, c.cy + dy.d AS py
      FROM cells c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    ),
    nbp AS (
      SELECT a.user_id AS id_a, b.user_id AS id_b
      FROM probe a JOIN bcells b
        ON b.cx = a.px AND b.cy = a.py AND b.user_id <> a.user_id
       AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= {_GEO_EPS * _GEO_EPS}
    ),
    deg AS (SELECT id_a AS user_id, count(*) AS nn FROM nbp GROUP BY 1),
    core AS (
      SELECT user_id FROM deg WHERE nn >= {_DBSCAN_MINPTS}
    ),
    cek AS (
      SELECT id_a, id_b FROM (
        SELECT nbp.id_a, nbp.id_b,
               row_number() OVER (PARTITION BY nbp.id_a
                                  ORDER BY nbp.id_b ASC) AS rn
        FROM nbp
        JOIN core ca ON ca.user_id = nbp.id_a
        JOIN core cb ON cb.user_id = nbp.id_b
      ) WHERE rn <= {_DBSCAN_EDGECAP}
    ),
    ce AS (
      SELECT id_a, id_b FROM cek
      UNION
      SELECT id_b AS id_a, id_a AS id_b FROM cek
    ),
    reach(id, lbl) AS (
      SELECT user_id, user_id FROM core
      UNION
      SELECT ce.id_b, r.lbl FROM reach r JOIN ce ON ce.id_a = r.id
    ),
    comp AS (SELECT id AS user_id, min(lbl) AS cluster FROM reach GROUP BY 1),
    border AS (
      SELECT user_id, min(cluster) AS cluster FROM (
        SELECT nbp.id_a AS user_id, comp.cluster,
               row_number() OVER (PARTITION BY nbp.id_a
                                  ORDER BY nbp.id_b ASC) AS rn
        FROM nbp
        JOIN comp ON comp.user_id = nbp.id_b
        LEFT JOIN core c1 ON c1.user_id = nbp.id_a
        WHERE c1.user_id IS NULL
      ) WHERE rn <= {_DBSCAN_EDGECAP}
      GROUP BY 1
    ),
    lab AS (
      SELECT user_id, cluster, TRUE AS is_core FROM comp
      UNION ALL
      SELECT user_id, cluster, FALSE FROM border
    ),
    cl AS (
      SELECT cluster,
             sum(CASE WHEN is_core THEN 1 ELSE 0 END) AS n_core,
             sum(CASE WHEN is_core THEN 0 ELSE 1 END) AS n_border
      FROM lab GROUP BY 1
    ),
    noise AS (
      SELECT count(*) AS n FROM pt
      LEFT JOIN lab ON lab.user_id = pt.user_id
      WHERE lab.user_id IS NULL
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(n_core AS BIGINT) AS n_core,
           CAST(n_border AS BIGINT) AS n_border,
           CAST(n_core + n_border AS BIGINT) AS n_total
    FROM cl
    UNION ALL
    SELECT -1, 0, 0, CAST(n AS BIGINT) FROM noise
    """,
)
def dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL distributed DBSCAN, composed from parts the engine already
    owns: the grid-bucketed region query (`dbscan_core_points`) finds
    cores, the iterative min-label connected components operator
    (`operators/graph.py` — the same one that clusters near-duplicate
    documents) merges the core-core epsilon-graph, and border points
    attach to the smallest adjacent core's cluster (the deterministic
    tie-break for DBSCAN's classic border ambiguity). Output is the
    per-cluster census plus a -1 noise row — so the whole clustering
    is value-hash-checked against a recursive-CTE oracle.

    Scale shape: candidate generation stays cell-key-bounded and the
    pair stream is never materialized (degree counting streams through
    a map-side-combining aggregate; r12: the _DBSCAN_EDGECAP adjacency
    truncation bounds every edge list actually KEPT at <= N·cap rows,
    symmetrized for the core merge; r13: the _DBSCAN_CELLCAP build-side
    occupancy cap bounds the candidate STREAM at 9·cellcap·N rows, so
    CPU work is linear in corpus size too — the r12 shape had bounded
    memory but still did O(density²) work in the cell join); border
    attachment runs over the capped adjacency. This is the standard
    production DBSCAN decomposition (region query -> core graph CC ->
    border pass) with a bounded-degree, bounded-work epsilon graph."""
    pt, lab = _dbscan_labels(spark, sf_dir)
    cl = lab.groupBy("cluster").agg(
        F.sum(F.when(F.col("is_core"), 1).otherwise(0)).alias("n_core"),
        F.sum(F.when(F.col("is_core"), 0).otherwise(1)).alias("n_border"),
    )
    noise = pt.join(lab, "user_id", "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )
    return cl.select(
        F.col("cluster").cast("long").alias("cluster"),
        F.col("n_core").cast("long").alias("n_core"),
        F.col("n_border").cast("long").alias("n_border"),
        (F.col("n_core") + F.col("n_border")).cast("long").alias("n_total"),
    ).unionAll(
        noise.select(
            F.lit(-1).cast("long"),
            F.lit(0).cast("long"),
            F.lit(0).cast("long"),
            F.col("n").cast("long"),
        )
    )


def _dbscan_labels(spark: SparkSession, sf_dir: str):
    """Per-point DBSCAN assignment — (pt, lab) where lab is
    (user_id, cluster, is_core); noise points are pt rows absent from
    lab. Extracted from dbscan_clusters (r14, pure code motion — the
    census derives from this frame) so tools/probe_scale100.py can
    compute the capped-vs-uncapped cluster-assignment agreement metric
    (VERDICT r13 item 3) by evaluating the SAME pipeline under a
    monkeypatched _DBSCAN_CELLCAP, pricing what the cap costs in
    assignment quality, not just dropped build mass."""
    from dataengineeringproject_spark.operators.graph import (
        connected_components,
    )

    u = load_table(spark, sf_dir, "events").select("user_id").distinct()
    x = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-x")
    y = X.token_hash(F.col("user_id").cast("string"), seed=_GEO_SEED + "-y")
    pt = u.select(
        "user_id",
        (x % _GEO_EXTENT).alias("x"),
        (y % _GEO_EXTENT).alias("y"),
    )
    cells = pt.select(
        "user_id", "x", "y",
        F.expr(f"x div {_GEO_EPS}").alias("cx"),
        F.expr(f"y div {_GEO_EPS}").alias("cy"),
    )
    from pyspark.sql import Window

    wcell = Window.partitionBy("cx", "cy").orderBy(F.asc("user_id"))
    bcells = (
        cells.withColumn("crn", F.row_number().over(wcell))
        .filter(F.col("crn") <= _DBSCAN_CELLCAP)
        .drop("crn")
    )
    offsets = local_df(
        # pure-JVM literal (r15): createDataFrame(py_list) builds a
        # Python-RDD-backed plan that launches Python workers on every
        # execution of the broadcast build (see schemas.local_df)
        spark,
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx int, dy int",
    )
    probe = cells.crossJoin(F.broadcast(offsets)).select(
        F.col("user_id").alias("ida"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.col("cx") + F.col("dx")).alias("px"),
        (F.col("cy") + F.col("dy")).alias("py"),
    )
    bb = bcells.select(
        F.col("user_id").alias("idb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    # the pair stream: deliberately NOT cached — each of the three
    # consumers below either aggregates it on the fly (deg) or
    # truncates it to a capped adjacency before materializing; r13: the
    # capped build side (_DBSCAN_CELLCAP) bounds the stream itself at
    # 9·cap·N candidate rows, so the WORK is linear too (the r12
    # edge cap only bounded what gets kept).
    nbp = (
        probe.join(
            bb,
            (F.col("bcx") == F.col("px"))
            & (F.col("bcy") == F.col("py"))
            & (F.col("ida") != F.col("idb")),
        )
        .filter(d2 <= _GEO_EPS * _GEO_EPS)
        .select(F.col("ida").alias("id_a"), F.col("idb").alias("id_b"))
    )
    deg = nbp.groupBy(F.col("id_a").alias("user_id")).agg(
        F.count(F.lit(1)).alias("nn")
    )
    core = (
        deg.filter(F.col("nn") >= _DBSCAN_MINPTS).select("user_id")
        .localCheckpoint()
    )
    wadj = Window.partitionBy("id_a").orderBy(F.asc("id_b"))
    ce = (
        nbp.join(
            core.select(F.col("user_id").alias("id_a")), "id_a"
        )
        .join(core.select(F.col("user_id").alias("id_b")), "id_b")
        .withColumn("rn", F.row_number().over(wadj))
        .filter(F.col("rn") <= _DBSCAN_EDGECAP)
        .select("id_a", "id_b")
    )
    # connected_components symmetrizes + dedups the edge list itself,
    # matching the oracle's explicit UNION of both directions.
    comp = connected_components(
        core.select(F.col("user_id").alias("id")), ce
    ).select(F.col("id").alias("user_id"), F.col("component").alias("cluster"))
    border = (
        nbp.join(
            comp.select(
                F.col("user_id").alias("id_b"), F.col("cluster")
            ),
            "id_b",
        )
        .join(
            core.select(F.col("user_id").alias("id_a")), "id_a", "left_anti"
        )
        .withColumn("rn", F.row_number().over(wadj))
        .filter(F.col("rn") <= _DBSCAN_EDGECAP)
        .groupBy(F.col("id_a").alias("user_id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    lab = comp.select(
        "user_id", "cluster", F.lit(True).alias("is_core")
    ).unionAll(
        border.select("user_id", "cluster", F.lit(False).alias("is_core"))
    )
    return pt, lab


# --- one-step Huber M-estimator of location ---------------------------------------

_HUBER_K = 15  # clip at 1.5 x MAD, expressed in tenths (integer arithmetic)


@register(
    "huber_one_step_mean",
    oracle=f"""
    WITH q AS (
      SELECT event_type, CAST(round(value * 1e3) AS BIGINT) AS vu, event_id
      FROM events
    ),
    r AS (
      SELECT event_type, vu,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY vu ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM q
    ),
    med AS (
      SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN vu END) AS m
      FROM r GROUP BY 1
    ),
    dev AS (
      SELECT q.event_type, q.vu, abs(q.vu - med.m) AS ad, q.event_id
      FROM q JOIN med USING (event_type)
    ),
    dr AS (
      SELECT event_type, ad,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ad ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad
      FROM dr GROUP BY 1
    ),
    cl AS (
      SELECT dev.event_type,
             greatest(least(dev.vu,
                            med.m + mad.mad * {_HUBER_K} // 10),
                      med.m - mad.mad * {_HUBER_K} // 10) AS cvu
      FROM dev
      JOIN med ON med.event_type = dev.event_type
      JOIN mad ON mad.event_type = dev.event_type
    )
    SELECT cl.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(max(med.m) / 1e3, 6) AS median,
           round(max(mad.mad) / 1e3, 6) AS mad,
           round(sum(cvu) / 1e3 / count(*), 6) AS huber_mean
    FROM cl
    JOIN med ON med.event_type = cl.event_type
    JOIN mad ON mad.event_type = cl.event_type
    GROUP BY 1
    """,
)
def huber_one_step_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step Huber M-estimator of location per event type: values
    WINSORIZED at median +/- {_HUBER_K}/10 x MAD, then averaged — the
    textbook one-step M-estimate from a robust start, sitting between
    the median (fully robust, inefficient) and the mean (efficient,
    fragile) and complementing `trimmed_mean_value` (which DROPS the
    tails; Huber CLAMPS them). Medians and MADs are rank-selected
    lower medians under total orders, the clip bound is integer
    arithmetic (k in tenths), and the clamped sum is exact integers.

    Scale shape: two rank windows per type (value order, deviation
    order — the exact-quantile shuffles), one clamped projection, one
    map-side-combined aggregate."""
    from pyspark.sql import Window

    q = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
        "event_id",
    )
    wv = Window.partitionBy("event_type").orderBy(
        F.asc("vu"), F.asc("event_id")
    )
    wn = Window.partitionBy("event_type")
    r = q.select(
        "event_type", "vu",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        r.filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("vu").alias("m"))
    )
    dev = q.join(F.broadcast(med), "event_type").select(
        "event_type", "vu", F.abs(F.col("vu") - F.col("m")).alias("ad"),
        "event_id",
    )
    wd = Window.partitionBy("event_type").orderBy(
        F.asc("ad"), F.asc("event_id")
    )
    dr = dev.select(
        "event_type", "ad",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = (
        dr.filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("ad").alias("mad"))
    )
    cl = (
        dev.join(F.broadcast(mad), "event_type")
        .join(
            F.broadcast(med.select(F.col("event_type"), F.col("m"))),
            "event_type",
        )
        .select(
            "event_type",
            "m",
            "mad",
            F.greatest(
                F.least(
                    F.col("vu"),
                    F.col("m") + F.expr(f"mad * {_HUBER_K} div 10"),
                ),
                F.col("m") - F.expr(f"mad * {_HUBER_K} div 10"),
            ).alias("cvu"),
        )
    )
    return cl.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.max("m") / F.lit(1e3), 6).alias("median"),
        F.round(F.max("mad") / F.lit(1e3), 6).alias("mad"),
        F.round(
            F.sum("cvu") / F.lit(1e3) / F.count(F.lit(1)), 6
        ).alias("huber_mean"),
    )


# --- intra-day (hourly) profile per event type -------------------------------------


@register(
    "hourly_profile_by_type",
    oracle="""
    WITH e AS (SELECT event_type, hour(ts) AS hr FROM events),
    c AS (SELECT event_type, hr, count(*) AS n FROM e GROUP BY 1, 2),
    t AS (SELECT event_type, sum(n) AS tot, max(n) AS mx FROM c GROUP BY 1)
    SELECT c.event_type, CAST(c.hr AS BIGINT) AS hour,
           CAST(c.n AS BIGINT) AS n,
           round(c.n * 1e0 / t.tot, 6) AS share,
           (c.n = t.mx) AS is_peak
    FROM c JOIN t USING (event_type)
    """,
)
def hourly_profile_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-day activity profile: per (event type, hour-of-day) the
    count, share, and peak flag — the diurnal fingerprint behind
    capacity planning, bot detection (machine traffic is flat or
    spikes off-human-hours), and the choice of maintenance windows.
    Hour comes from wall-clock field extraction (no epoch math); ties
    for the peak flag mark every maximal hour rather than picking one
    arbitrarily.

    Scale shape: one map-side-combined (type, hour) aggregate to a
    <= |types| x 24 frame; everything after runs on it."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hr")
    )
    c = ev.groupBy("event_type", "hr").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.max("n").alias("mx")
    )
    return c.join(F.broadcast(t), "event_type").select(
        "event_type",
        F.col("hr").cast("long").alias("hour"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * F.lit(1.0) / F.col("tot"), 6).alias("share"),
        (F.col("n") == F.col("mx")).alias("is_peak"),
    )


# --- binned-quantile error audit -----------------------------------------------------

_QEA_BINS = 256
_QEA_PCTS = (50, 95, 99)


def _qea_oracle() -> str:
    exact_cols = ", ".join(
        f"ROUND(quantile_cont(value, {p / 100}), 6) AS ex_{p}"
        for p in _QEA_PCTS
    )
    approx_branches = []
    for p in _QEA_PCTS:
        approx_branches.append(f"""
        SELECT event_type, {p} AS pct,
               min(lo + bin * w) AS approx_v
        FROM (
          SELECT event_type, bin, lo, w, n,
                 sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
          FROM binned)
        WHERE cum * 100 >= n * {p}
        GROUP BY 1, 2""")
    return f"""
    WITH mm AS (
      SELECT event_type, min(value) AS lo, max(value) AS hi,
             count(*) AS n
      FROM events GROUP BY 1
    ),
    binned AS (
      SELECT e.event_type,
             least(CAST(floor((e.value - mm.lo) * {_QEA_BINS}
                              / (mm.hi - mm.lo + 1e-9)) AS BIGINT),
                   {_QEA_BINS - 1}) AS bin,
             mm.lo, (mm.hi - mm.lo + 1e-9) / {_QEA_BINS} AS w, mm.n,
             count(*) AS c
      FROM events e JOIN mm USING (event_type)
      GROUP BY 1, 2, 3, 4, 5
    ),
    ap AS ({' UNION ALL '.join(approx_branches)}),
    ex AS (SELECT event_type, {exact_cols} FROM events GROUP BY 1)
    SELECT ap.event_type, CAST(ap.pct AS BIGINT) AS pct,
           round(CASE ap.pct WHEN 50 THEN ex.ex_50
                             WHEN 95 THEN ex.ex_95
                             ELSE ex.ex_99 END, 6) AS exact_v,
           round(ap.approx_v, 6) AS approx_v,
           round(abs(ap.approx_v
                     - CASE ap.pct WHEN 50 THEN ex.ex_50
                                   WHEN 95 THEN ex.ex_95
                                   ELSE ex.ex_99 END), 6) AS abs_err
    FROM ap JOIN ex USING (event_type)
    """


@register("quantile_approx_error_audit", oracle=_qea_oracle())
def quantile_approx_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honesty metric for binned quantiles: per (type, percentile) the
    EXACT interpolated quantile next to the {_QEA_BINS}-bin equal-width
    estimate (lower edge of the first bin whose cumulative count
    reaches ceil(p*n) — the grid convention the engine's *_binned
    family uses) and the absolute error — the number that justifies,
    or rejects, replacing a per-key sort with a fixed grid at 100 TB
    (error is bounded by one bin width; this query shows the realized
    value). Cumulative counts and the p*n comparison are integer
    arithmetic; the one float bin-width division uses identical IEEE
    operands in both engines.

    Scale shape: the binned side is one map-side-combined (type, bin)
    aggregate; only the EXACT side sorts per key — at scale you drop
    it and this audit (run on a sample) is the evidence you may."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        ev.join(F.broadcast(mm), "event_type")
        .select(
            "event_type", "lo", "n",
            ((F.col("hi") - F.col("lo") + F.lit(1e-9)) / _QEA_BINS).alias(
                "w"
            ),
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    * _QEA_BINS
                    / (F.col("hi") - F.col("lo") + F.lit(1e-9))
                ).cast("long"),
                F.lit(_QEA_BINS - 1),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin", "lo", "w", "n")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    wc = Window.partitionBy("event_type").orderBy("bin")
    cum = binned.select(
        "event_type", "bin", "lo", "w", "n",
        F.sum("c").over(wc).alias("cum"),
    )
    ap = None
    for p in _QEA_PCTS:
        br = (
            cum.filter(F.col("cum") * 100 >= F.col("n") * p)
            .groupBy("event_type")
            .agg(
                F.lit(p).alias("pct"),
                F.min(F.col("lo") + F.col("bin") * F.col("w")).alias(
                    "approx_v"
                ),
            )
        )
        ap = br if ap is None else ap.unionAll(br)
    ex = ev.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {p / 100})").alias(f"ex_{p}")
            for p in _QEA_PCTS
        ]
    )
    exact_v = (
        F.when(F.col("pct") == 50, F.col("ex_50"))
        .when(F.col("pct") == 95, F.col("ex_95"))
        .otherwise(F.col("ex_99"))
    )
    return ap.join(F.broadcast(ex), "event_type").select(
        "event_type",
        F.col("pct").cast("long").alias("pct"),
        F.round(exact_v, 6).alias("exact_v"),
        F.round(F.col("approx_v"), 6).alias("approx_v"),
        F.round(F.abs(F.col("approx_v") - exact_v), 6).alias("abs_err"),
    )


# --- Hurst exponent via rescaled-range (R/S) analysis --------------------------------

_HURST_SIZES = (7, 14)  # non-overlapping block sizes over the daily series


def _hurst_block_sql(size: int) -> str:
    return f"""
      SELECT {size} AS bs, (rn - 1) // {size} AS blk, mu,
             sum(mu) OVER (PARTITION BY (rn - 1) // {size}
                           ORDER BY rn) AS cums,
             row_number() OVER (PARTITION BY (rn - 1) // {size}
                                ORDER BY rn) AS brn,
             sum(mu) OVER (PARTITION BY (rn - 1) // {size}) AS bsum,
             sum(mu * mu) OVER (PARTITION BY (rn - 1) // {size}) AS bss
      FROM ds
      WHERE rn <= ({size}) * ((SELECT count(*) FROM ds) // {size})
    """


@register(
    "hurst_rs_daily",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    d AS (
      SELECT day, CAST(round(sum(vu) * 1e3 / count(*)) AS BIGINT) AS mu
      FROM e GROUP BY 1
    ),
    ds AS (
      SELECT mu, row_number() OVER (ORDER BY day) AS rn FROM d
    ),
    blocks AS (
      {_hurst_block_sql(_HURST_SIZES[0])}
      UNION ALL
      {_hurst_block_sql(_HURST_SIZES[1])}
    ),
    dev AS (
      SELECT bs, blk,
             cums * bs - brn * bsum AS cdev,
             bsum, bss
      FROM blocks
    ),
    rs AS (
      SELECT bs, blk,
             (max(cdev) - min(cdev)) * 1e0 / bs AS r,
             sqrt(greatest(CAST(max(bss) AS DOUBLE) / bs
                           - (CAST(max(bsum) AS DOUBLE) / bs)
                             * (CAST(max(bsum) AS DOUBLE) / bs), 1e-9))
               AS s
      FROM dev GROUP BY 1, 2, bs
    ),
    m AS (
      SELECT bs,
             CAST(round(sum(CAST(round(r / s * 1e6) AS BIGINT))
                        * 1e0 / count(*)) AS BIGINT) AS rsu,
             count(*) AS n_blocks
      FROM (SELECT bs, blk, r, s FROM rs) rs GROUP BY 1
    ),
    h AS (
      SELECT (SELECT ln(rsu / 1e6) FROM m WHERE bs = {_HURST_SIZES[1]})
             - (SELECT ln(rsu / 1e6) FROM m WHERE bs = {_HURST_SIZES[0]})
               AS dln
    )
    SELECT CAST(m.bs AS BIGINT) AS block_size,
           CAST(m.n_blocks AS BIGINT) AS n_blocks,
           round(m.rsu / 1e6, 6) AS mean_rs,
           round(h.dln / ln({_HURST_SIZES[1]}e0 / {_HURST_SIZES[0]}), 6)
             AS hurst_h
    FROM m CROSS JOIN h
    """,
)
def hurst_rs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily mean-value series by rescaled-range
    (R/S) analysis: per non-overlapping block of {_HURST_SIZES[0]} and
    {_HURST_SIZES[1]} days, the range of cumulative deviations over
    the block std, averaged per size; H = the log-log slope between
    the two sizes. H ~ 0.5 is a random walk, H > 0.5 long-range
    persistence (trends feed themselves), H < 0.5 mean reversion — the
    long-memory diagnostic ACF's fixed lags can't summarize.
    Cumulative deviations are cross-multiplied integers
    (cums*bs - brn*bsum), block R/S re-quantizes to micro-units before
    the per-size mean, and the avg-vs-variance inside each block uses
    the exact integer window sums.

    Scale shape: one daily rollup; every window is partitioned by
    block over the |days| frame. Two sizes keep the slope a closed
    form (more sizes = the same plan with a small OLS on the tail)."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        ts_to_date("ts").alias("day"),
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
    )
    d = ev.groupBy("day").agg(
        F.round(F.sum("vu") * 1e3 / F.count(F.lit(1)))
        .cast("long")
        .alias("mu")
    )
    ds = d.select(
        "mu", F.row_number().over(Window.orderBy("day")).alias("rn")
    )
    nd = ds.agg(F.count(F.lit(1)).alias("ndays"))

    def _per_size(size: int):
        base = ds.crossJoin(F.broadcast(nd)).filter(
            F.col("rn") <= size * F.expr(f"ndays div {size}")
        )
        blk = F.expr(f"(rn - 1) div {size}")
        wb = Window.partitionBy(blk).orderBy("rn")
        wp = Window.partitionBy(blk)
        b = base.select(
            F.lit(size).alias("bs"),
            blk.alias("blk"),
            F.sum("mu").over(wb).alias("cums"),
            F.row_number().over(wb).alias("brn"),
            F.sum("mu").over(wp).alias("bsum"),
            F.sum(F.col("mu") * F.col("mu")).over(wp).alias("bss"),
        )
        dev = b.select(
            "bs", "blk",
            (F.col("cums") * size - F.col("brn") * F.col("bsum")).alias(
                "cdev"
            ),
            "bsum", "bss",
        )
        rs = dev.groupBy("bs", "blk").agg(
            (
                (F.max("cdev") - F.min("cdev")) * F.lit(1.0) / size
            ).alias("r"),
            F.sqrt(
                F.greatest(
                    F.max("bss").cast("double") / size
                    - (F.max("bsum").cast("double") / size)
                    * (F.max("bsum").cast("double") / size),
                    F.lit(1e-9),
                )
            ).alias("s"),
        )
        return rs.groupBy("bs").agg(
            F.round(
                F.sum(
                    F.round(F.col("r") / F.col("s") * F.lit(1e6)).cast(
                        "long"
                    )
                )
                * F.lit(1.0)
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("rsu"),
            F.count(F.lit(1)).alias("n_blocks"),
        )

    m = _per_size(_HURST_SIZES[0]).unionAll(_per_size(_HURST_SIZES[1]))
    a = m.filter(F.col("bs") == _HURST_SIZES[0]).select(
        F.col("rsu").alias("rs_a")
    )
    b2 = m.filter(F.col("bs") == _HURST_SIZES[1]).select(
        F.col("rsu").alias("rs_b")
    )
    h = a.crossJoin(b2).select(
        (
            (F.log(F.col("rs_b") / F.lit(1e6))
             - F.log(F.col("rs_a") / F.lit(1e6)))
            / F.lit(float(__import__("math").log(_HURST_SIZES[1] / _HURST_SIZES[0])))
        ).alias("hh")
    )
    return m.crossJoin(F.broadcast(h)).select(
        F.col("bs").cast("long").alias("block_size"),
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.round(F.col("rsu") / F.lit(1e6), 6).alias("mean_rs"),
        F.round(F.col("hh"), 6).alias("hurst_h"),
    )


# --- entropy rate of the event Markov chain ------------------------------------------


@register(
    "markov_entropy_rate",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS cur, nxt, count(*) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT cur, sum(n) AS rn FROM c GROUP BY 1),
    t AS (SELECT sum(n) AS tn FROM c),
    h AS (
      SELECT c.cur, c.n, r.rn, t.tn,
             CAST(round(-(c.n * 1e0 / r.rn) * ln(c.n * 1e0 / r.rn) * 1e9)
                  AS BIGINT) AS hu
      FROM c JOIN r USING (cur) CROSS JOIN t
    ),
    rowh AS (
      SELECT cur, max(rn) AS rn, max(tn) AS tn, sum(hu) AS rhu
      FROM h GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_states,
           round(sum(CAST(rn AS DOUBLE) / tn * rhu) / 1e9, 6)
             AS entropy_rate_nats,
           round(max(rhu) / 1e9, 6) AS max_row_entropy
    FROM rowh
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order event Markov chain: the
    frequency-weighted mean of per-state transition entropies — the
    single number summarizing `event_transition_matrix` (how
    predictable is the NEXT action given the current one; the gap to
    ln(k) is the predictive juice a next-event model can extract).
    Per-transition -p*ln(p) terms quantize to nano-units so row
    entropies are exact integers; only the final |states|-row weighted
    mean multiplies small doubles.

    Scale shape: identical to the transition matrix — one lead()
    window on the user key, one map-side-combined count to |types|^2
    rows, arithmetic on that frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    s = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = s.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    r = c.groupBy("cur").agg(F.sum("n").alias("rn"))
    t = c.agg(F.sum("n").alias("tn"))
    p = F.col("n") * F.lit(1.0) / F.col("rn")
    h = (
        c.join(F.broadcast(r), "cur")
        .crossJoin(F.broadcast(t))
        .select(
            "cur", "rn", "tn",
            F.round(-p * F.log(p) * F.lit(1e9)).cast("long").alias("hu"),
        )
    )
    rowh = h.groupBy("cur").agg(
        F.max("rn").alias("rn"),
        F.max("tn").alias("tn"),
        F.sum("hu").alias("rhu"),
    )
    return rowh.agg(
        F.count(F.lit(1)).cast("long").alias("n_states"),
        F.round(
            F.sum(F.col("rn").cast("double") / F.col("tn") * F.col("rhu"))
            / F.lit(1e9),
            6,
        ).alias("entropy_rate_nats"),
        F.round(F.max("rhu") / F.lit(1e9), 6).alias("max_row_entropy"),
    )


# --- Poisson dispersion test over per-user activity -----------------------------------


@register(
    "poisson_dispersion_users",
    oracle="""
    WITH u AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY 1
    ),
    s AS (
      SELECT count(*) AS n, sum(c) AS sc, sum(c * c) AS ssc FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(sc * 1e0 / n, 6) AS mean_events,
           round((CAST(n AS DOUBLE) * ssc - CAST(sc AS DOUBLE) * sc)
                 / (CAST(n AS DOUBLE) * (n - 1)), 6) AS var_events,
           round(((CAST(n AS DOUBLE) * ssc - CAST(sc AS DOUBLE) * sc)
                  / (CAST(n AS DOUBLE) * (n - 1)))
                 / (sc * 1e0 / n), 6) AS dispersion_index,
           round(((CAST(n AS DOUBLE) * ssc - CAST(sc AS DOUBLE) * sc)
                  / (CAST(n AS DOUBLE) * (n - 1)))
                 / (sc * 1e0 / n) * (n - 1), 6) AS chi2_stat
    FROM s
    """,
)
def poisson_dispersion_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion (index-of-dispersion) test on per-user event
    counts: variance/mean with its chi-square statistic (n-1)*D — the
    first question about any count process (D ~ 1 Poisson-random
    usage; D >> 1 overdispersed power users / bots, the regime where
    negative-binomial modeling and the burstiness family take over;
    D << 1 suspiciously regular, the quota/scheduler signature). All
    sufficient statistics are exact integers; the sample variance uses
    the cross-multiplied form.

    Scale shape: one map-side-combined per-user count (the only
    shuffle), one 1-row reduce."""
    u = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("ssc"),
    )
    n = F.col("n").cast("double")
    var = (n * F.col("ssc") - F.col("sc").cast("double") * F.col("sc")) / (
        n * (F.col("n") - 1)
    )
    mean = F.col("sc") * F.lit(1.0) / F.col("n")
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(mean, 6).alias("mean_events"),
        F.round(var, 6).alias("var_events"),
        F.round(var / mean, 6).alias("dispersion_index"),
        F.round(var / mean * (F.col("n") - 1), 6).alias("chi2_stat"),
    )


# --- effective source count (inverse Simpson diversity) ------------------------------


@register(
    "effective_source_count",
    oracle=f"""
    WITH tok AS (
      SELECT source, len({X.tokens_sql('lower(text)')}) AS nt FROM documents
    ),
    s AS (SELECT source, sum(nt) AS n FROM tok GROUP BY 1),
    t AS (SELECT sum(n) AS tn, count(*) AS k FROM s),
    sh AS (
      SELECT t.k, t.tn,
             sum(CAST(round((s.n * 1e0 / t.tn) * (s.n * 1e0 / t.tn) * 1e12)
                      AS BIGINT)) AS sq,
             max(s.n) AS mx
      FROM s CROSS JOIN t GROUP BY 1, 2
    )
    SELECT CAST(k AS BIGINT) AS n_sources,
           round(1e12 / sq, 6) AS effective_sources,
           round(mx * 1e0 / tn, 6) AS top_share
    FROM sh
    """,
)
def effective_source_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective number of sources by token mass — the inverse-Simpson
    diversity index 1/sum(share^2): the number of EQUALLY-SIZED
    sources that would give the same concentration (20 sources where 2
    hold most tokens behave like ~2 — the number a mixture designer
    actually reasons about, complementing the per-source entropy and
    Gini views with an interpretable count). Shares divide exact
    integer token sums; sum over the |sources| frame.

    Scale shape: one pure-projection token count, one per-source
    aggregate, arithmetic on the tiny share frame."""
    d = load_table(spark, sf_dir, "documents")
    from dataengineeringproject_spark.functions import text as XT

    s = d.select(
        "source", F.size(XT.tokens(F.lower(F.col("text")))).alias("nt")
    ).groupBy("source").agg(F.sum("nt").alias("n"))
    t = s.agg(F.sum("n").alias("tn"), F.count(F.lit(1)).alias("k"))
    share = F.col("n") * F.lit(1.0) / F.col("tn")
    return (
        s.crossJoin(F.broadcast(t))
        .groupBy("k")
        .agg(
            F.sum(
                F.round(share * share * F.lit(1e12)).cast("long")
            ).alias("sq"),
            F.max("n").alias("mx"),
            F.max("tn").alias("tn"),
        )
        .select(
            F.col("k").cast("long").alias("n_sources"),
            F.round(F.lit(1e12) / F.col("sq"), 6).alias(
                "effective_sources"
            ),
            F.round(F.col("mx") * F.lit(1.0) / F.col("tn"), 6).alias(
                "top_share"
            ),
        )
    )


# --- STREAMING event transitions (sequence family batch/streaming symmetry) ---------

_ETR_STREAM_RESULT: dict[str, str] = {}


@register(
    "streaming_event_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS cur_type, nxt AS next_type, count(*) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT cur_type, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.cur_type, c.next_type, CAST(c.n AS BIGINT) AS n,
           round(c.n * 1e0 / r.tot, 6) AS prob
    FROM c JOIN r USING (cur_type)
    """,
)
def streaming_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `event_transition_matrix` — the SEQUENCE
    family joins the batch/streaming symmetry roster, and it is the
    hardest symmetry so far: transitions PAIR CONSECUTIVE EVENTS, so a
    pair straddling two micro-batches exists in neither. foreachBatch
    keeps two state tables: each user's LAST event (the dangling end
    of their sequence) and the accumulated transition counts. Per
    micro-batch: in-batch transitions come from the usual lead()
    window; BOUNDARY transitions join the previous last-event state to
    each user's first event of the batch; the last-event state then
    advances to the batch's newest event per user. Chronological
    micro-batches (streaming_q._staged_events) make the boundary join
    respect the (ts, event_id) total order, so the converged counts
    equal the batch window's exactly — full value-hash oracle shared
    with the batch twin, no rows-only exemption.

    At 100 TB: both state tables are keyed by user (co-partitioned
    with the stream), the per-trigger cost is O(micro-batch +
    |users touched|), and the counts table is |types|^2 rows forever
    — this is how production sessionizers stitch sequences across
    triggers (Flink keyed state; Spark's own sessionization keeps the
    same dangling-end state)."""
    if sf_dir in _ETR_STREAM_RESULT:
        counts = spark.read.parquet(_ETR_STREAM_RESULT[sf_dir])
    else:
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import Window

        from dataengineeringproject_spark.queries.streaming_q import (
            _pinned_shuffle_partitions,
            _staged_events,
        )
        from dataengineeringproject_spark.sources.layout import (
            vacuum_versions,
        )

        land = _staged_events(spark, sf_dir)
        ev = load_table(spark, sf_dir, "events")
        roots = {
            k: tempfile.mkdtemp(prefix=f"deps_etr_{k}_")
            for k in ("last", "cnt", "ckpt")
        }
        for p in roots.values():
            atexit.register(shutil.rmtree, p, ignore_errors=True)
        st: dict[str, str | None] = {"last": None, "cnt": None}

        def _step(batch_ev: DataFrame, batch_id: int) -> None:
            w = Window.partitionBy("user_id").orderBy(
                F.asc("ts"), F.asc("event_id")
            )
            b = batch_ev.select(
                "user_id", "event_type", "ts", "event_id",
                F.lead("event_type").over(w).alias("nxt"),
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1))
                .over(Window.partitionBy("user_id"))
                .alias("cnt_u"),
            )
            inb = (
                b.filter(F.col("nxt").isNotNull())
                .groupBy(
                    F.col("event_type").alias("cur_type"),
                    F.col("nxt").alias("next_type"),
                )
                .agg(F.count(F.lit(1)).alias("n"))
            )
            first = b.filter(F.col("rn") == 1).select(
                "user_id", F.col("event_type").alias("first_type")
            )
            last = b.filter(F.col("rn") == F.col("cnt_u")).select(
                "user_id",
                F.col("event_type").alias("last_type"),
                "ts",
                "event_id",
            )
            if st["last"] is not None:
                prev_last = spark.read.parquet(st["last"])
                boundary = (
                    prev_last.join(first, "user_id")
                    .groupBy(
                        F.col("last_type").alias("cur_type"),
                        F.col("first_type").alias("next_type"),
                    )
                    .agg(F.count(F.lit(1)).alias("n"))
                )
                inb = inb.unionByName(boundary)
                # users silent this batch keep their dangling end
                carry = prev_last.join(last, "user_id", "left_anti")
                last = last.unionByName(carry)
            if st["cnt"] is not None:
                inb = inb.unionByName(spark.read.parquet(st["cnt"]))
            cnt_new = inb.groupBy("cur_type", "next_type").agg(
                F.sum("n").alias("n")
            )
            for key, df in (("last", last), ("cnt", cnt_new)):
                path = f"{roots[key]}/v{batch_id}"
                df.write.mode("overwrite").parquet(path)
                st[key] = path
                vacuum_versions(roots[key], keep=2, current=path)

        with _pinned_shuffle_partitions(spark, 8):
            q = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(land)
                .writeStream.foreachBatch(_step)
                .option("checkpointLocation", roots["ckpt"])
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        _ETR_STREAM_RESULT[sf_dir] = st["cnt"]
        counts = spark.read.parquet(st["cnt"])
    r = counts.groupBy("cur_type").agg(F.sum("n").alias("tot"))
    return counts.join(F.broadcast(r), "cur_type").select(
        "cur_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * F.lit(1.0) / F.col("tot"), 6).alias("prob"),
    )


# --- Hodges-Lehmann estimator of the daily series center -----------------------------


@register(
    "hodges_lehmann_daily",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    d AS (
      SELECT day, CAST(round(sum(vu) * 1e3 / count(*)) AS BIGINT) AS mu
      FROM e GROUP BY 1
    ),
    p AS (
      SELECT a.mu + b.mu AS w2, a.day AS da, b.day AS db
      FROM d a JOIN d b ON a.day <= b.day
    ),
    r AS (
      SELECT w2, row_number() OVER (ORDER BY w2 ASC, da ASC, db ASC) AS rn,
             count(*) OVER () AS n
      FROM p
    )
    SELECT CAST(max(n) AS BIGINT) AS n_pairs,
           round(max(CASE WHEN rn = (n + 1) // 2 THEN w2 END) / 2e0 / 1e6,
                 6) AS hodges_lehmann
    FROM r
    """,
)
def hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann estimator of the daily mean-value series'
    center: the median of all pairwise (Walsh) averages — the location
    estimator dual to the Wilcoxon test, more efficient than the
    median, nearly as robust, and the number reported alongside it in
    serious robust analysis (joining the median, trimmed, and Huber
    members already shipped). Pairwise sums stay integers (halving
    deferred to output), the median is rank-selected under a total
    order over (sum, day pair).

    Scale shape: one daily rollup; the O(|days|^2) Walsh-pair frame
    and its rank select live entirely on the tiny daily table."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        ts_to_date("ts").alias("day"),
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
    )
    d = ev.groupBy("day").agg(
        F.round(F.sum("vu") * 1e3 / F.count(F.lit(1)))
        .cast("long")
        .alias("mu")
    )
    a = d.select(F.col("day").alias("da"), F.col("mu").alias("ma"))
    b = d.select(F.col("day").alias("db"), F.col("mu").alias("mb"))
    p = a.join(b, F.col("da") <= F.col("db")).select(
        (F.col("ma") + F.col("mb")).alias("w2"), "da", "db"
    )
    w = Window.orderBy(F.asc("w2"), F.asc("da"), F.asc("db"))
    r = p.select(
        "w2",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    return r.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.round(
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("w2"))
            )
            / F.lit(2e0)
            / F.lit(1e6),
            6,
        ).alias("hodges_lehmann"),
    )


# --- design effect of per-source stratification --------------------------------------


@register(
    "design_effect_stratified",
    oracle=f"""
    WITH f AS (
      SELECT source, n_chars AS qu FROM documents
    ),
    g AS (
      SELECT source, count(*) AS nh, sum(qu) AS sh, sum(qu * qu) AS ssh
      FROM f GROUP BY 1
    ),
    t AS (
      SELECT sum(nh) AS n, sum(sh) AS s, sum(ssh) AS ss,
             sum(CAST(round(CAST(sh AS DOUBLE) * sh / nh) AS BIGINT)) AS st,
             count(*) AS k
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS n_strata, CAST(n AS BIGINT) AS n_docs,
           round((CAST(ss AS DOUBLE)
                  - CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT))
                 / (n - 1), 6) AS var_srs,
           round((CAST(ss AS DOUBLE) - st) / (n - k), 6) AS var_within,
           round(((CAST(ss AS DOUBLE) - st) / (n - k))
                 / ((CAST(ss AS DOUBLE)
                     - CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT))
                    / (n - 1)), 6) AS design_effect
    FROM t
    """,
)
def design_effect_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect of stratifying by source when estimating mean
    document length: within-stratum variance over SRS variance — the
    survey-sampling number that says how much precision proportional
    per-source allocation buys over simple random sampling (DEFF < 1:
    strata explain variance, stratify; DEFF ~ 1: sources are
    homogeneous in length, stratification buys nothing — the honest
    result on this synthetic corpus). Completes the sampling-theory
    family around sample_neyman_allocation (which OPTIMIZES the
    allocation; this measures whether stratifying matters at all).
    The ANOVA re-quantization keeps every sum partitioning-exact.

    Scale shape: one map-side-combined per-source aggregate, one
    1-row reduce."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("n_chars").alias("sh"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ssh"),
    )
    t = g.agg(
        F.sum("nh").alias("n"),
        F.sum("sh").alias("s"),
        F.sum("ssh").alias("ss"),
        F.sum(
            F.round(
                F.col("sh").cast("double") * F.col("sh") / F.col("nh")
            ).cast("long")
        ).alias("st"),
        F.count(F.lit(1)).alias("k"),
    )
    tot_dev = F.col("ss").cast("double") - F.round(
        F.col("s").cast("double") * F.col("s") / F.col("n")
    ).cast("long")
    var_srs = tot_dev / (F.col("n") - 1)
    var_within = (F.col("ss").cast("double") - F.col("st")) / (
        F.col("n") - F.col("k")
    )
    return t.select(
        F.col("k").cast("long").alias("n_strata"),
        F.col("n").cast("long").alias("n_docs"),
        F.round(var_srs, 6).alias("var_srs"),
        F.round(var_within, 6).alias("var_within"),
        F.round(var_within / var_srs, 6).alias("design_effect"),
    )


# --- Wilcoxon signed-rank test on paired half-month days -----------------------------

_WSR_PAIR_GAP = 15  # pair day d with day d+15 (same weekday, adjacent halves)


@register(
    "wilcoxon_signed_rank_halves",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(round(value * 1e3) AS BIGINT) AS vu
      FROM events
    ),
    d AS (
      SELECT day, CAST(round(sum(vu) * 1e3 / count(*)) AS BIGINT) AS mu
      FROM e GROUP BY 1
    ),
    p AS (
      SELECT a.day, b.mu - a.mu AS diff
      FROM d a JOIN d b ON b.day = a.day + to_days({_WSR_PAIR_GAP})
      WHERE b.mu <> a.mu
    ),
    r AS (
      SELECT diff,
             row_number() OVER (ORDER BY abs(diff) ASC, day ASC) AS rk
      FROM p
    ),
    s AS (
      SELECT count(*) AS n,
             sum(CASE WHEN diff > 0 THEN rk ELSE 0 END) AS wp
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_pairs, CAST(wp AS BIGINT) AS w_plus,
           round(n * (n + 1e0) / 4, 6) AS expected_w,
           round((wp - n * (n + 1e0) / 4)
                 / NULLIF(sqrt(n * (n + 1e0) * (2 * n + 1) / 24e0), 0), 6)
             AS z_score
    FROM s
    """,
)
def wilcoxon_signed_rank_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test pairing each day with the day
    {_WSR_PAIR_GAP} later (same weekday, first vs second half of the
    month): did the level SHIFT between halves, asked the PAIRED
    nonparametric way — the within-pair design that removes weekday
    effects the unpaired Mann-Whitney (drift family) cannot, and the
    test the drift monitors defer to when a matched structure exists.
    Zero differences drop (standard treatment); |diff| ranks use a
    deterministic day tie-break; W+ and the normal-approximation z
    are exact-integer derived.

    Scale shape: one daily rollup; pairing and ranking on the |days|
    frame."""
    from dataengineeringproject_spark.functions.datetime_fns import ts_to_date
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        ts_to_date("ts").alias("day"),
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
    )
    d = ev.groupBy("day").agg(
        F.round(F.sum("vu") * 1e3 / F.count(F.lit(1)))
        .cast("long")
        .alias("mu")
    )
    a = d.select(F.col("day").alias("da"), F.col("mu").alias("ma"))
    b = d.select(F.col("day").alias("db"), F.col("mu").alias("mb"))
    p = (
        a.join(b, F.col("db") == F.date_add(F.col("da"), _WSR_PAIR_GAP))
        .filter(F.col("mb") != F.col("ma"))
        .select(F.col("da").alias("day"), (F.col("mb") - F.col("ma")).alias("diff"))
    )
    w = Window.orderBy(F.asc(F.abs(F.col("diff"))), F.asc("day"))
    r = p.select("diff", F.row_number().over(w).alias("rk"))
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("rk")).otherwise(0)).alias(
            "wp"
        ),
    )
    n = F.col("n").cast("double")
    expw = n * (n + 1) / 4
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("wp").cast("long").alias("w_plus"),
        F.round(expw, 6).alias("expected_w"),
        F.round(
            (F.col("wp") - expw)
            / F.nullif(
                F.sqrt(n * (n + 1) * (2 * F.col("n") + 1) / F.lit(24.0)),
                F.lit(0.0),
            ),
            6,
        ).alias("z_score"),
    )


# --- winsorized mean per group (robust-stats family, third member) ---------------

_WINS_PCT = 10  # percent CLAMPED at each tail (integer arithmetic)


@register(
    "winsorized_mean_value",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             CAST(round(value * 1e3) AS BIGINT) AS vu,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    t AS (
      SELECT event_type, n, (n * {_WINS_PCT}) // 100 AS cut, vu, rn
      FROM q
    )
    SELECT event_type,
           CAST(any_value(n) AS BIGINT) AS n_total,
           CAST(any_value(cut) AS BIGINT) AS cut_per_tail,
           round(sum(vu) / 1e3 / any_value(n), 6) AS raw_mean,
           round((sum(vu) FILTER (rn > cut AND rn <= n - cut)
                  + any_value(cut) * max(CASE WHEN rn = cut + 1
                                              THEN vu END)
                  + any_value(cut) * max(CASE WHEN rn = n - cut
                                              THEN vu END))
                 / 1e3 / any_value(n), 6) AS winsorized_mean
    FROM t GROUP BY 1
    """,
)
def winsorized_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_WINS_PCT}%%-per-tail WINSORIZED mean of event value by type —
    the third member of the robust-location trio: the trimmed mean
    DROPS the tails, the one-step Huber mean soft-clamps residuals,
    winsorization hard-CLAMPS each tail to the nearest kept order
    statistic (x(g+1) below, x(n-g) above), keeping n constant so the
    estimate stays comparable with the raw mean at equal weight. Cut
    counts are integer (n*{_WINS_PCT} div 100), tail boundaries come
    from the same (value, event_id) total order as the trimmed mean,
    and everything stays milli-unit integer until the single final
    division — exact under any partitioning.

    Scale shape: identical to trimmed_mean_value — one shuffle on
    event_type for the rank window, then a map-side conditional
    aggregate; the boundary order statistics fall out of the same
    window (no extra pass)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    wn = Window.partitionBy("event_type")
    q = ev.select(
        "event_type",
        F.round(F.col("value") * 1e3).cast("long").alias("vu"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).withColumn("cut", F.expr(f"(n * {_WINS_PCT}) div 100"))
    kept = (F.col("rn") > F.col("cut")) & (
        F.col("rn") <= F.col("n") - F.col("cut")
    )
    lo = F.max(
        F.when(F.col("rn") == F.col("cut") + 1, F.col("vu"))
    )
    hi = F.max(
        F.when(F.col("rn") == F.col("n") - F.col("cut"), F.col("vu"))
    )
    return q.groupBy("event_type").agg(
        F.any_value("n").cast("long").alias("n_total"),
        F.any_value("cut").cast("long").alias("cut_per_tail"),
        F.round(F.sum("vu") / F.lit(1e3) / F.any_value("n"), 6).alias(
            "raw_mean"
        ),
        F.round(
            (
                F.sum(F.when(kept, F.col("vu")).otherwise(0))
                + F.any_value("cut") * lo
                + F.any_value("cut") * hi
            )
            / F.lit(1e3)
            / F.any_value("n"),
            6,
        ).alias("winsorized_mean"),
    )


# --- Mahalanobis outliers (multivariate complement of the MAD z-score) -----------

_MAHA_TOPK = 20


@register(
    "mahalanobis_outliers",
    oracle=f"""
    WITH q AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_quantity * 1e3) AS BIGINT) AS qx,
             CAST(round(l_extendedprice) AS BIGINT) AS qy
      FROM lineitem
    ),
    m AS (
      SELECT count(*) AS n,
             CAST(sum(qx) AS BIGINT) // count(*) AS mx,
             CAST(sum(qy) AS BIGINT) // count(*) AS my
      FROM q
    ),
    c AS (
      SELECT l_orderkey, l_linenumber, qx - mx AS cx, qy - my AS cy, n
      FROM q CROSS JOIN m
    ),
    s AS (
      SELECT any_value(n) AS n,
             CAST(sum(cx) AS BIGINT) AS sx, CAST(sum(cy) AS BIGINT) AS sy,
             CAST(sum(cx * cx) AS BIGINT) AS sxx,
             CAST(sum(cy * cy) AS BIGINT) AS syy,
             CAST(sum(cx * cy) AS BIGINT) AS sxy
      FROM c
    ),
    v AS (
      SELECT n,
             sx / CAST(n AS DOUBLE) AS ex, sy / CAST(n AS DOUBLE) AS ey,
             sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE))
               * (sx / CAST(n AS DOUBLE)) AS vxx,
             syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE))
               * (sy / CAST(n AS DOUBLE)) AS vyy,
             sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE))
               * (sy / CAST(n AS DOUBLE)) AS vxy
      FROM s
    ),
    d AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(
               (v.vyy * (c.cx - v.ex) * (c.cx - v.ex)
                - 2 * v.vxy * (c.cx - v.ex) * (c.cy - v.ey)
                + v.vxx * (c.cy - v.ey) * (c.cy - v.ey))
               / (v.vxx * v.vyy - v.vxy * v.vxy) * 1e6) AS BIGINT) AS d2u
      FROM c CROSS JOIN v
    ),
    r AS (
      SELECT *, row_number() OVER (
        ORDER BY d2u DESC, l_orderkey ASC, l_linenumber ASC) AS rank
      FROM d
    )
    SELECT CAST(rank AS BIGINT) AS rank, l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(d2u / 1e6, 6) AS d2
    FROM r WHERE rank <= {_MAHA_TOPK}
    """,
)
def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_MAHA_TOPK} multivariate outliers by Mahalanobis distance
    over (l_quantity, l_extendedprice) — the correlation-aware
    complement of the univariate MAD z-score (`outlier_mad_robust_
    zscore`): a point can sit inside both marginal ranges yet be far
    from the joint distribution, and d² = (x−μ)ᵀΣ⁻¹(x−μ) with the 2×2
    covariance inverted in closed form is exactly that screen. Two
    passes: integer rough-centering (floor of the quantized mean, so
    every residual and the five sufficient statistics stay exact
    int64 at sf0.1 magnitudes), then per-row d² in doubles over those
    exact integers with an identical expression tree in both engines;
    ranking is on the microunit-quantized d².

    Scale shape: two map-side aggregates (the 1-row stats frames
    broadcast back), one scalar projection, TakeOrdered top-k — the
    raw table is never shuffled."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") * 1e3).cast("long").alias("qx"),
        F.round(F.col("l_extendedprice")).cast("long").alias("qy"),
    )
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(qx) div count(*)").alias("mx"),
        F.expr("sum(qy) div count(*)").alias("my"),
    )
    c = li.join(F.broadcast(m)).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("qx") - F.col("mx")).alias("cx"),
        (F.col("qy") - F.col("my")).alias("cy"),
        "n",
    )
    s = c.agg(
        F.any_value("n").alias("n"),
        F.sum("cx").alias("sx"),
        F.sum("cy").alias("sy"),
        F.sum(F.col("cx") * F.col("cx")).alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).alias("syy"),
        F.sum(F.col("cx") * F.col("cy")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    v = s.select(
        (F.col("sx") / nd).alias("ex"),
        (F.col("sy") / nd).alias("ey"),
        (F.col("sxx") / nd - (F.col("sx") / nd) * (F.col("sx") / nd)).alias(
            "vxx"
        ),
        (F.col("syy") / nd - (F.col("sy") / nd) * (F.col("sy") / nd)).alias(
            "vyy"
        ),
        (F.col("sxy") / nd - (F.col("sx") / nd) * (F.col("sy") / nd)).alias(
            "vxy"
        ),
    )
    ax = F.col("cx") - F.col("ex")
    ay = F.col("cy") - F.col("ey")
    d = c.join(F.broadcast(v)).select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            (
                F.col("vyy") * ax * ax
                - 2 * F.col("vxy") * ax * ay
                + F.col("vxx") * ay * ay
            )
            / (F.col("vxx") * F.col("vyy") - F.col("vxy") * F.col("vxy"))
            * 1e6
        )
        .cast("long")
        .alias("d2u"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(
        F.desc("d2u"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _MAHA_TOPK)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.round(F.col("d2u") / 1e6, 6).alias("d2"),
        )
    )


# --- stratified propensity adjustment (observational-causal family) ------------
# Treatment assignment is a seeded hash draw whose RATE varies by
# event_type — a deterministic synthetic confound (value distributions
# differ by type, so the naive treated-vs-control difference is biased
# by the type mix). Stratifying on the confounder and reweighting
# control means by the TREATED stratum mix (the ATT estimand) removes
# exactly that bias; with the within-stratum draw random, the honest
# answer is an ATT near zero next to a visibly nonzero naive diff.

_ATT_SEED = "att"
_ATT_THRESH = (
    "CASE event_type WHEN 'click' THEN 25 WHEN 'error' THEN 40 "
    "WHEN 'purchase' THEN 70 WHEN 'signup' THEN 60 ELSE 35 END"
)


@register(
    "propensity_strata_att",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             CASE WHEN {X.token_hash_sql("CAST(event_id AS VARCHAR)", seed=_ATT_SEED)}
                       % 100 < {_ATT_THRESH}
                  THEN 1 ELSE 0 END AS t,
             CAST(round(value * 1e3) AS BIGINT) AS yu
      FROM events
    ),
    st AS (
      SELECT event_type,
             CAST(sum(t) AS BIGINT) AS nt,
             CAST(sum(CASE WHEN t = 1 THEN yu ELSE 0 END) AS BIGINT) AS su_t,
             CAST(sum(1 - t) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN t = 0 THEN yu ELSE 0 END) AS BIGINT) AS su_c
      FROM base GROUP BY 1
    ),
    g AS (
      SELECT CAST(sum(nt) AS BIGINT) AS n_t, CAST(sum(su_t) AS BIGINT) AS s_t,
             CAST(sum(nc) AS BIGINT) AS n_c, CAST(sum(su_c) AS BIGINT) AS s_c,
             CAST(sum(CASE WHEN nt > 0 AND nc > 0 THEN
               CAST(round(nt * (su_t * 1e0 / nt - su_c * 1e0 / nc)) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS attu
      FROM st
    )
    SELECT n_t AS n_treated, n_c AS n_control,
           round((s_t * 1e0 / n_t - s_c * 1e0 / n_c) / 1e3, 6) AS naive_diff,
           round(attu / 1e3 / n_t, 6) AS att_stratified,
           round((s_t * 1e0 / n_t - s_c * 1e0 / n_c) / 1e3
                 - attu / 1e3 / n_t, 6) AS confounding_bias
    FROM g
    """,
)
def propensity_strata_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified propensity adjustment (ATT by direct
    standardization): treatment is a seeded-hash draw whose RATE is a
    deterministic function of event_type, so treated units
    over-sample the high-value types and the NAIVE treated-vs-control
    difference is pure confounding; stratifying on event_type and
    weighting each stratum's control mean by the TREATED mix removes
    the structural bias, leaving only within-stratum sampling noise
    around the true null (at sf0.01: naive −0.95 vs ATT −0.51 with a
    per-stratum SE near 0.6 — the confounded component is gone). This is the observational-causal
    counterpart of the randomized abtest pair — same engine, same
    hash-assignment machinery, opposite identification problem — and
    the bias it removes is reported in-band (confounding_bias =
    naive − ATT). Per-stratum sums are milli-unit integers; each
    stratum's contribution is quantized before the cross-stratum sum
    so no double aggregation order exists.

    Scale shape: one map-side-combined groupBy over 5 strata, then a
    1-row reduce. Nothing shuffles but 5 rows."""
    ev = load_table(spark, sf_dir, "events")
    t = F.when(
        X.token_hash(F.col("event_id").cast("string"), seed=_ATT_SEED) % 100
        < F.expr(_ATT_THRESH),
        1,
    ).otherwise(0)
    base = ev.select(
        "event_type",
        t.alias("t"),
        F.round(F.col("value") * 1e3).cast("long").alias("yu"),
    )
    st = base.groupBy("event_type").agg(
        F.sum("t").cast("long").alias("nt"),
        F.sum(F.when(F.col("t") == 1, F.col("yu")).otherwise(0))
        .cast("long")
        .alias("su_t"),
        F.sum(1 - F.col("t")).cast("long").alias("nc"),
        F.sum(F.when(F.col("t") == 0, F.col("yu")).otherwise(0))
        .cast("long")
        .alias("su_c"),
    )
    contrib = F.when(
        (F.col("nt") > 0) & (F.col("nc") > 0),
        F.round(
            F.col("nt")
            * (
                F.col("su_t") * 1e0 / F.col("nt")
                - F.col("su_c") * 1e0 / F.col("nc")
            )
        ).cast("long"),
    ).otherwise(F.lit(0))
    g = st.agg(
        F.sum("nt").cast("long").alias("n_t"),
        F.sum("su_t").cast("long").alias("s_t"),
        F.sum("nc").cast("long").alias("n_c"),
        F.sum("su_c").cast("long").alias("s_c"),
        F.sum(contrib).cast("long").alias("attu"),
    )
    naive = (
        F.col("s_t") * 1e0 / F.col("n_t")
        - F.col("s_c") * 1e0 / F.col("n_c")
    ) / 1e3
    att = F.col("attu") / 1e3 / F.col("n_t")
    return g.select(
        F.col("n_t").alias("n_treated"),
        F.col("n_c").alias("n_control"),
        F.round(naive, 6).alias("naive_diff"),
        F.round(att, 6).alias("att_stratified"),
        F.round(naive - att, 6).alias("confounding_bias"),
    )
