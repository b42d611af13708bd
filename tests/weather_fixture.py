"""Synthetic weather_history fixture (FIXTURES.md §1) + an independent
pandas implementation of the reference's v1-intent semantics used as
the golden oracle for the pipeline parity test.

The pandas golden below is written from the semantics in SURVEY.md §2
(clamp-then-median-fill, skipna means, mode tie rules) — it is NOT a
copy of the reference code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

STRENGTH_BOUNDS = [
    (1.5, "Calm"), (3.3, "Light Air"), (5.4, "Light Breeze"),
    (7.9, "Gentle Breeze"), (10.7, "Moderate Breeze"), (13.8, "Fresh Breeze"),
    (17.1, "Strong Breeze"), (20.7, "Near Gale"), (24.4, "Gale"),
    (28.4, "Strong Gale"), (32.6, "Storm"),
]


def make_weather_fixture(n_hours: int = 2000, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = pd.date_range("2006-04-01", periods=n_hours, freq="h")
    offsets = np.where(ts.month.isin([4, 5, 6, 7, 8, 9]), "+0200", "+0100")
    dates = [
        f"{t:%Y-%m-%d %H:%M:%S}.000 {o}" for t, o in zip(ts, offsets)
    ]

    temp = rng.normal(12, 9, n_hours)
    app_temp = temp - rng.uniform(0, 4, n_hours)
    humidity = rng.uniform(0, 1, n_hours).round(2)
    wind = rng.gamma(2.0, 6.0, n_hours)
    bearing = rng.uniform(0, 359, n_hours).round(0)
    visibility = rng.uniform(0, 16, n_hours).round(1)
    cloud = np.zeros(n_hours)
    pressure = rng.normal(1015, 8, n_hours)

    df = pd.DataFrame(
        {
            "Formatted Date": dates,
            "Summary": rng.choice(["Clear", "Overcast", "Foggy"], n_hours),
            "Precip Type": rng.choice(["rain", "snow", None], n_hours, p=[0.6, 0.3, 0.1]),
            "Temperature (C)": temp,
            "Apparent Temperature (C)": app_temp,
            "Humidity": humidity,
            "Wind Speed (km/h)": wind,
            "Wind Bearing (degrees)": bearing,
            "Visibility (km)": visibility,
            "Loud Cover": cloud,
            "Pressure (millibars)": pressure,
            "Daily Summary": "day summary",
        }
    )

    # nulls for the median fill (P6)
    for col in ["Temperature (C)", "Apparent Temperature (C)", "Humidity",
                "Wind Bearing (degrees)", "Pressure (millibars)"]:
        df.loc[rng.choice(n_hours, 40, replace=False), col] = np.nan
    # out-of-range incl. exact bounds (P5 open vs closed)
    df.loc[5, "Temperature (C)"] = -50.0       # open bound → null
    df.loc[6, "Temperature (C)"] = 50.0        # open bound → null
    df.loc[7, "Temperature (C)"] = 93.0
    df.loc[8, "Humidity"] = 1.0                # closed bound → kept
    df.loc[9, "Humidity"] = 1.3                # out of range
    df.loc[10, "Humidity"] = 0.0               # closed bound → kept
    df.loc[11, "Pressure (millibars)"] = 870.0 # closed → kept
    df.loc[12, "Pressure (millibars)"] = 500.0
    df.loc[13, "Visibility (km)"] = -3.0
    df.loc[14, "Visibility (km)"] = 0.0        # closed-left → kept
    df.loc[15, "Wind Speed (km/h)"] = 409.5
    df.loc[16, "Wind Speed (km/h)"] = -4.0     # clamp [0,408] → null
    # exact Beaufort boundaries in m/s → km/h (boundary → lower bucket)
    for i, (ms, _) in enumerate(STRENGTH_BOUNDS):
        df.loc[20 + i, "Wind Speed (km/h)"] = ms * 3.6
    df.loc[33, "Wind Speed (km/h)"] = 32.61 * 3.6  # top bucket
    # unparseable dates (P7)
    df.loc[40, "Formatted Date"] = "not-a-date"
    df.loc[41, "Formatted Date"] = ""
    return df


def pandas_golden(df: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """v1-intent semantics in pandas, independently implemented."""
    df = df.copy()

    def parse(x):
        try:
            return pd.to_datetime(x[:23], format="%Y-%m-%d %H:%M:%S.%f").date()
        except (ValueError, TypeError):
            return None

    df["date"] = df["Formatted Date"].map(parse)
    df = df[df["date"].notna()].copy()
    df["Month"] = df["date"].map(lambda d: f"{d:%Y-%m}")

    clamps = {
        "Temperature (C)": lambda x: x if -50 < x < 50 else np.nan,
        "Apparent Temperature (C)": lambda x: x if -50 < x < 50 else np.nan,
        "Humidity": lambda x: x if 0 <= x <= 1 else np.nan,
        "Wind Speed (km/h)": lambda x: x if 0 <= x <= 408 else np.nan,
        "Visibility (km)": lambda x: x if x >= 0 else np.nan,
        "Pressure (millibars)": lambda x: x if 870 <= x <= 1083.8 else np.nan,
    }
    for col, fn in clamps.items():
        df[col] = df[col].map(lambda x: np.nan if pd.isna(x) else fn(x))
    for col in ["Temperature (C)", "Apparent Temperature (C)", "Humidity",
                "Wind Speed (km/h)", "Wind Bearing (degrees)", "Visibility (km)",
                "Loud Cover", "Pressure (millibars)"]:
        df[col] = df[col].fillna(df[col].median())

    def classify(kmh):
        if pd.isna(kmh):
            return None
        ms = kmh * 1000 / 3600
        if ms < 0:
            return None
        for hi, label in STRENGTH_BOUNDS:
            if ms <= hi:
                return label
        return "Violent Storm"

    df["wind_strengths"] = df["Wind Speed (km/h)"].map(classify)

    def mode_min(s):
        vc = s.dropna().value_counts()
        if len(vc) == 0:
            return None
        top = vc[vc == vc.max()]
        return sorted(top.index)[0]

    def mode_or_nan(s):
        vc = s.dropna().value_counts()
        if len(vc) == 0:
            return None
        if (vc == vc.max()).sum() > 1:
            return None
        return vc.idxmax()

    g = df.groupby("date")
    daily = pd.DataFrame(
        {
            "Formatted Date": sorted(g.groups),
            "daily_avg_temperature": g["Temperature (C)"].mean().values,
            "daily_avg_apparent_temperature": g["Apparent Temperature (C)"].mean().values,
            "daily_avg_humidity": g["Humidity"].mean().values,
            "daily_avg_wind_speed": g["Wind Speed (km/h)"].mean().values,
            "daily_avg_visibility": g["Visibility (km)"].mean().values,
            "daily_avg_pressure": g["Pressure (millibars)"].mean().values,
            "wind_strength": g["wind_strengths"].apply(mode_min).values,
        }
    )
    gm = df.groupby("Month")
    monthly = pd.DataFrame(
        {
            "Month": sorted(gm.groups),
            "monthly_avg_temperature": gm["Temperature (C)"].mean().values,
            "monthly_avg_apparent_temperature": gm["Apparent Temperature (C)"].mean().values,
            "monthly_avg_humidity": gm["Humidity"].mean().values,
            "monthly_avg_visibility": gm["Visibility (km)"].mean().values,
            "monthly_avg_pressure": gm["Pressure (millibars)"].mean().values,
            "mode_precipitation_type": gm["Precip Type"].apply(mode_or_nan).values,
        }
    )
    return {"daily": daily, "monthly": monthly}
