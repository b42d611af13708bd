"""Reference-derived operators (SURVEY.md §2) as driver queries over the
testdata `events` table — the analog of the reference's hourly weather
table (FIXTURES.md §3): ts→Formatted Date, value→measure,
event_type→categorical, event_id→stable file order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringproject_spark.functions.datetime_fns import month_str, ts_to_date
from dataengineeringproject_spark.functions.units import kmh_to_ms
from dataengineeringproject_spark.functions.wind import classify_wind, classify_wind_sql
from dataengineeringproject_spark.operators.aggregates import agg_mode, grouped_means
from dataengineeringproject_spark.operators.cleaning import (
    clamp_to_null,
    dedup_keep_first,
    drop_unparseable,
    exact_medians,
)
from dataengineeringproject_spark.registry import register
from dataengineeringproject_spark.schemas import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- flagship: A1 + A3 + O1 ------------------------------------------------

@register(
    "daily_agg",
    oracle="""
    WITH src AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value FROM events),
    c AS (
      SELECT day, event_type AS v, count(*) AS cnt
      FROM src WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT day, v,
             row_number() OVER (PARTITION BY day ORDER BY cnt DESC, v ASC) AS rn
      FROM c
    ),
    m AS (SELECT day, avg(value) AS avg_value FROM src GROUP BY 1)
    SELECT m.day, ROUND(m.avg_value, 6) AS avg_value, r.v AS mode_event_type
    FROM m LEFT JOIN (SELECT day, v FROM r WHERE rn = 1) r USING (day)
    """,
)
def daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 grouped mean + A3 deterministic mode at daily grain
    (group_project_dag.py:135-146)."""
    from dataengineeringproject_spark.plans.flagship import daily_events_summary

    return daily_events_summary(spark, sf_dir)


# --- A2 + A4: monthly grain, mode-or-null ----------------------------------

@register(
    "monthly_agg",
    oracle="""
    WITH src AS (SELECT strftime(ts, '%Y-%m') AS month, event_type, value FROM events),
    c AS (
      SELECT month, event_type AS v, count(*) AS cnt
      FROM src WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    cm AS (
      SELECT *, max(cnt) OVER (PARTITION BY month) AS maxc FROM c
    ),
    r AS (
      SELECT month, v, cnt,
             row_number() OVER (PARTITION BY month ORDER BY cnt DESC, v ASC) AS rn,
             count(*) FILTER (WHERE cnt = maxc) OVER (PARTITION BY month) AS n_at_max
      FROM cm
    ),
    m AS (SELECT month, avg(value) AS avg_value FROM src GROUP BY 1)
    SELECT m.month, ROUND(m.avg_value, 6) AS avg_value,
           CASE WHEN r.n_at_max > 1 THEN NULL ELSE r.v END AS mode_event_type
    FROM m LEFT JOIN (SELECT month, v, n_at_max FROM r WHERE rn = 1) r USING (month)
    """,
)
def monthly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 grouped mean + A4 mode-or-null-on-tie at monthly grain
    (group_project_dag.py:153-159, get_precip_mode_or_nan :102-110)."""
    ev = _events(spark, sf_dir).select(
        month_str("ts").alias("month"), "event_type", "value"
    )
    means = grouped_means(ev, ["month"], ["value"], prefix="avg_")
    mode = agg_mode(ev, ["month"], "event_type", on_tie="null", alias="mode_event_type")
    return (
        means.join(mode, "month", "left")
        .select("month", F.round("avg_value", 6).alias("avg_value"), "mode_event_type")
        .orderBy("month")
    )


# --- E1/E2/E3: scalar expression layer -------------------------------------

@register(
    "scalar_exprs",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d') AS day,
           strftime(ts, '%Y-%m') AS month,
           ROUND(value * 1000 / 3600, 6) AS value_ms
    FROM events
    """,
)
def scalar_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 date extraction, E2 month string, E3 unit conversion — pure
    projections, no shuffle; whole-stage codegen replaces the
    reference's per-row `.apply` (group_project_dag.py:124,126,72-73)."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.date_format(ts_to_date("ts"), "yyyy-MM-dd").alias("day"),
        month_str("ts").alias("month"),
        F.round(kmh_to_ms("value"), 6).alias("value_ms"),
    )


# --- E4: wind bucketing -----------------------------------------------------

_WIND_MS = "value / 10.0"  # events.value (~0-200) scaled into Beaufort m/s range

@register(
    "wind_buckets",
    oracle=f"""
    SELECT {classify_wind_sql(_WIND_MS)} AS wind_strength,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    """,
)
def wind_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: the 12-bucket Beaufort chain (group_project_dag.py:70-98) as a
    native when-chain, aggregated to bucket counts."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(classify_wind(F.col("value") / 10.0).alias("wind_strength"))
        .groupBy("wind_strength")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- P5 + P6: clamp to null, median fill -----------------------------------

_CLAMP_LO, _CLAMP_HI = 20.0, 180.0  # open/closed mix exercised on events.value

@register(
    "clamp_median_fill",
    oracle=f"""
    WITH clamped AS (
      SELECT event_id,
             CASE WHEN value > {_CLAMP_LO} AND value <= {_CLAMP_HI}
                  THEN value END AS value_c
      FROM events
    ),
    med AS (SELECT median(value_c) AS m FROM clamped)
    SELECT event_id,
           ROUND(coalesce(value_c, (SELECT m FROM med)), 6) AS value_filled
    FROM clamped
    """,
)
def clamp_median_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 open-low/closed-high clamp + P6 exact-median fill
    (v5_group_project_dag.py:79-94). Medians computed AFTER clamping,
    matching the reference's ordering."""
    ev = _events(spark, sf_dir).select("event_id", F.col("value").alias("value_c"))
    clamped = clamp_to_null(ev, {"value_c": (_CLAMP_LO, _CLAMP_HI, False, True)})
    med = exact_medians(clamped, ["value_c"])["value_c"]
    return clamped.select(
        "event_id",
        F.round(F.coalesce("value_c", F.lit(med)), 6).alias("value_filled"),
    )


# --- P4: dedup keep-first ---------------------------------------------------

@register(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_first_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: keep the first row per key in stable input order
    (v5_group_project_dag.py:97); event_id supplies the file order pandas
    gets implicitly."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "event_type")
    return dedup_keep_first(ev, ["user_id"], "event_id")


# --- P7: drop rows with unparseable values ---------------------------------

@register(
    "drop_unparseable",
    oracle=r"""
    SELECT event_id, CAST(k AS BIGINT) AS k
    FROM (
      SELECT event_id,
             CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS INTEGER) AS k
      FROM events
    ) WHERE k IS NOT NULL
    """,
)
def drop_unparseable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: parse-then-drop-null — the intent of the reference's no-op
    dropna (group_project_dag.py:129, SURVEY.md §2.8.4), exercised on the
    events.props JSON blob."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.nullif(F.regexp_extract("props", r'"k":\s*(\d+)', 1), F.lit(""))
        .cast("long")
        .alias("k"),
    )
    return drop_unparseable(ev, ["k"])


# --- end-to-end pipeline analog: clean → fill → classify → daily agg -------

_PIPE_MS = "value_filled / 10.0"

@register(
    "pipeline_daily_weather_analog",
    oracle=f"""
    WITH clamped AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CASE WHEN value >= 0 AND value <= 408 THEN value END AS value_c
      FROM events
    ),
    med AS (SELECT median(value_c) AS m FROM clamped),
    filled AS (
      SELECT day, coalesce(value_c, (SELECT m FROM med)) AS value_filled
      FROM clamped
    ),
    labeled AS (
      SELECT day, value_filled,
             {classify_wind_sql(_PIPE_MS)} AS strength
      FROM filled
    ),
    means AS (SELECT day, avg(value_filled) AS avg_value FROM labeled GROUP BY day),
    c AS (
      SELECT day, strength AS v, count(*) AS cnt
      FROM labeled WHERE strength IS NOT NULL GROUP BY day, strength
    ),
    r AS (
      SELECT day, v,
             row_number() OVER (PARTITION BY day ORDER BY cnt DESC, v ASC) AS rn
      FROM c
    )
    SELECT m.day, ROUND(m.avg_value, 6) AS avg_value, r.v AS mode_strength
    FROM means m LEFT JOIN (SELECT day, v FROM r WHERE rn = 1) r USING (day)
    """,
)
def pipeline_daily_weather_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline end-to-end (clean → median-fill →
    classify → daily means + strength mode) on events-as-weather: the
    oracle-gated twin of plans/weather.py (whose exact-schema form is
    golden-tested in tests/test_weather_pipeline.py)."""
    from dataengineeringproject_spark.operators.cleaning import exact_medians

    ev = _events(spark, sf_dir).select(
        F.date_format(ts_to_date("ts"), "yyyy-MM-dd").alias("day"),
        F.col("value").alias("value_c"),
    )
    clamped = clamp_to_null(ev, {"value_c": (0.0, 408.0, True, True)})
    med = exact_medians(clamped, ["value_c"])["value_c"]
    labeled = clamped.select(
        "day",
        F.coalesce("value_c", F.lit(med)).alias("value_filled"),
    ).withColumn("strength", classify_wind(F.col("value_filled") / 10.0))
    # One (day, strength) pre-aggregate feeds BOTH outputs — a single
    # scan + one map-side-combined shuffle instead of separate
    # means/mode passes; everything after is |days|x|buckets| rows.
    # avg = sum/count over the partials (F.avg semantics: null values
    # excluded — value_filled is never null post-coalesce); mode =
    # argmax over non-null strengths with min-strength tie-break
    # (agg_mode semantics).
    counts = labeled.groupBy("day", "strength").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value_filled").alias("vsum"),
        F.count("value_filled").alias("vcnt"),
    )
    means = counts.groupBy("day").agg(
        (F.sum("vsum") / F.sum("vcnt")).alias("avg_value")
    )
    w = Window.partitionBy("day").orderBy(F.desc("cnt"), F.asc("strength"))
    mode = (
        counts.filter(F.col("strength").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("day", F.col("strength").alias("mode_strength"))
    )
    return (
        means.join(mode, "day", "left")
        .select("day", F.round("avg_value", 6).alias("avg_value"), "mode_strength")
    )


# --- A6/A7: validation checks as a queryable summary -----------------------

@register(
    "validation_summary",
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null_value,
           CAST(count(*) FILTER (WHERE value NOT BETWEEN 0 AND 1000) AS BIGINT) AS n_out_of_range,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    """,
)
def validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 null-existence + A7 range-universality checks
    (v5_group_project_dag.py:243-267) surfaced as counts; the fail-stop
    `expect` form is tested in
    tests/test_weather_pipeline.py::test_validation_gates_raise_reference_messages."""
    ev = _events(spark, sf_dir)
    return ev.agg(
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
        F.count(F.when(~F.col("value").between(0, 1000), 1)).alias("n_out_of_range"),
        F.count(F.lit(1)).alias("n_rows"),
    )
