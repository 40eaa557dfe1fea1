"""Regression tests for the climatology interpolation (find_between +
interpolate semantics, reference src/range_check.cpp:146-185) — including
the exhausted-scan -> NaN edge the reference exhibits for lat at/below the
last knot (pair(0,0) -> 0*inf)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from titanlib_spark.operators.range_check import (
    _MEAN_LATS,
    _MEAN_TEMPS,
    _VAR_AMPS,
    _VAR_LATS,
    _piecewise,
    range_check_climatology,
)


def ref_interp(lat, xs, ys):
    """Literal python mirror of the reference C++."""
    i1, i2 = 0, 0
    for i in range(len(xs)):
        if lat > xs[i]:
            i1, i2 = i - 1, i
            break
    space = xs[i1] - xs[i2]
    if space == 0:
        return float("nan")
    return ys[i1] + (ys[i2] - ys[i1]) * (xs[i1] - lat) / space


@pytest.mark.parametrize("xs,ys", [(_MEAN_LATS, _MEAN_TEMPS), (_VAR_LATS, _VAR_AMPS)])
def test_piecewise_matches_reference(spark, xs, ys):
    lats = [i / 2.0 for i in range(-180, 181, 5)]
    df = spark.createDataFrame([(l,) for l in lats], "lat double")
    rows = df.select("lat", _piecewise(F.col("lat"), xs, ys).alias("v")).collect()
    for r in rows:
        exp = ref_interp(r.lat, xs, ys)
        assert (math.isnan(r.v) and math.isnan(exp)) or abs(r.v - exp) < 1e-9, (
            f"lat={r.lat}: spark={r.v} ref={exp}"
        )


def test_climatology_check_flags(spark):
    # July, equator: clim mean = 30 + 0/2 = 30 -> bounds [30-60, 30+20]
    rows = [
        (0, 0.0, 25.0),   # inside
        (1, 0.0, 55.0),   # above 50 -> flagged
        (2, 0.0, -35.0),  # below -30 -> flagged
        (3, -80.0, 500.0),  # var-table NaN zone -> never flagged (reference NaN)
    ]
    df = spark.createDataFrame(rows, "id long, lat double, value double")
    out = range_check_climatology(df, pos=20.0, neg=-60.0, unixtime=1721606400)
    flags = {r.id: r.flags for r in out.collect()}
    assert flags == {0: 0, 1: 1, 2: 1, 3: 0}
