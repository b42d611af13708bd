"""Reference-parity golden test (SURVEY.md §5.2): the engine pipeline
vs an independent pandas implementation of v1-intent semantics, on a
fixture engineered to hit every edge (clamp bounds, Beaufort
boundaries, mode ties, unparseable dates, median fill).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.weather_fixture import make_weather_fixture, pandas_golden


@pytest.fixture(scope="module")
def fixture_df():
    return make_weather_fixture()


@pytest.fixture(scope="module")
def results(spark, fixture_df):
    from dataengineeringproject_spark.plans.weather import run_pipeline
    from dataengineeringproject_spark.schemas import WEATHER_HISTORY

    raw = spark.createDataFrame(fixture_df, schema=WEATHER_HISTORY)
    tables = run_pipeline(raw, validate=False)
    golden = pandas_golden(fixture_df)
    return tables, golden


def _assert_frame_match(spark_df, golden: pd.DataFrame, key: str):
    got = spark_df.toPandas().sort_values(key).reset_index(drop=True)
    want = golden.sort_values(key).reset_index(drop=True)
    assert list(got[key].astype(str)) == list(want[key].astype(str))
    for col in want.columns:
        if col == key:
            continue
        g, w = got[col], want[col]
        if w.dtype.kind == "f":
            assert np.allclose(
                g.astype(float), w.astype(float), rtol=1e-9, equal_nan=True
            ), f"{col} mismatch"
        else:
            assert [x if pd.notna(x) else None for x in g] == [
                x if pd.notna(x) else None for x in w
            ], f"{col} mismatch"


def test_daily_matches_golden(results):
    tables, golden = results
    _assert_frame_match(tables["daily"], golden["daily"], "Formatted Date")


def test_monthly_matches_golden(results):
    tables, golden = results
    _assert_frame_match(tables["monthly"], golden["monthly"], "Month")


def test_daily_row_count_is_distinct_dates(results, fixture_df):
    tables, _ = results
    n_days = tables["daily"].count()
    valid = fixture_df["Formatted Date"].str.match(r"\d{4}-\d{2}-\d{2} ")
    assert n_days == fixture_df.loc[valid, "Formatted Date"].str[:10].nunique()


def test_validation_gates_raise_reference_messages(spark, fixture_df):
    from dataengineeringproject_spark.operators.validation import ValidationError
    from dataengineeringproject_spark.plans.weather import run_pipeline, validate_stage
    from dataengineeringproject_spark.schemas import WEATHER_HISTORY
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(fixture_df, schema=WEATHER_HISTORY)
    tables = run_pipeline(raw, validate=False)

    # inject a violation: temperature far out of range
    bad_daily = tables["daily"].withColumn(
        "daily_avg_temperature", F.lit(99.0)
    )
    with pytest.raises(ValidationError, match="Daily temperature value outside"):
        validate_stage(bad_daily, tables["monthly"])

    bad_monthly = tables["monthly"].withColumn("monthly_avg_humidity", F.lit(2.0))
    with pytest.raises(ValidationError, match="Monthly humidity value outside"):
        validate_stage(tables["daily"], bad_monthly)

    null_daily = tables["daily"].withColumn(
        "daily_avg_pressure", F.lit(None).cast("double")
    )
    with pytest.raises(ValidationError, match="Missing critical data"):
        validate_stage(null_daily, tables["monthly"])


def test_wind_boundaries_land_in_lower_bucket(spark):
    """E4 boundary semantics: exactly 1.5 m/s → Calm, 32.6 → Storm."""
    from dataengineeringproject_spark.functions.wind import classify_wind
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1.5,), (3.3,), (32.6,), (32.7,), (-1.0,), (0.0,), (None,), (float("nan"),)],
        "ms double",
    )
    got = [r[0] for r in df.select(classify_wind("ms")).collect()]
    assert got == ["Calm", "Light Air", "Storm", "Violent Storm", None, "Calm", None, None]
