"""Range checks — pure column expressions (no shuffle, Catalyst-only).

Semantics: reference src/range_check.cpp:16-46 — a row is flagged when its
value is invalid (null/NaN) or outside [min, max]. Bounds may be scalars
(broadcast, the reference's length-1 convention) or column names
(per-row, the length-N convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD, apply_check_flags


def _as_col(bound) -> Column:
    return F.col(bound) if isinstance(bound, str) else F.lit(float(bound))


def is_invalid_value(c: Column) -> Column:
    """Reference is_valid (src/util.cpp:24-26): NaN, inf and MV are all
    invalid; we additionally canonicalize SQL NULL as invalid."""
    return c.isNull() | F.isnan(c.cast("double")) | (F.abs(c.cast("double")) == float("inf"))


def range_check(
    df: DataFrame,
    vmin,
    vmax,
    value_col: str = "value",
    flag_col: str = "flags",
) -> DataFrame:
    v = F.col(value_col)
    bad = is_invalid_value(v) | (v < _as_col(vmin)) | (v > _as_col(vmax))
    return apply_check_flags(df, F.when(bad, BAD).otherwise(GOOD), flag_col)


# Climatology lookup tables — reference src/range_check.cpp:95-110 defines a
# piecewise-linear latitude profile of mean temperature plus a seasonal
# variation profile, blended by month (src/range_check.cpp:119-143).
_MEAN_LATS = [90, 60, 50, 45, 40, 30, 15, 0, -15, -30, -35, -40, -45, -60, -90]
_MEAN_TEMPS = [-15, 5, 10, 15, 20, 25, 30, 30, 25, 21, 20, 15, 10, 0, -25]
_VAR_LATS = [90, 75, 60, 45, 30, 15, 0, -15, -30, -45, -60, -75, 90]
_VAR_AMPS = [40, 32, 30, 23, 13, 3, 0, 4, 7, 6, 11, 26, 31]
_MONTH_FACTOR = {1: -1.0, 12: -0.6, 2: -0.6, 11: -0.3, 3: -0.3, 5: 0.3, 9: 0.3, 6: 0.6, 8: 0.6, 7: 1.0}


def _piecewise(lat: Column, xs: list[float], ys: list[float]) -> Column:
    """Exact mirror of the reference's find_between + interpolate
    (src/range_check.cpp:146-185): scan knots in array order and take the
    FIRST i with `lat > xs[i]` -> interpolate segment (i-1, i). A scan
    that exhausts (lat at/below the last knot — including the var table's
    non-monotone trailing 90) yields pair(0,0) there, whose interpolation
    is 0*inf = NaN; NaN then never triggers a range flag, which we mirror
    with an explicit NaN fallback."""
    expr = F.lit(float("nan"))
    # build inside-out so the i=1 test ends up OUTERMOST (= first checked)
    for i in range(len(xs) - 1, 0, -1):
        x1, x2 = float(xs[i - 1]), float(xs[i])
        y1, y2 = float(ys[i - 1]), float(ys[i])
        frac = (F.lit(x1) - lat) / F.lit(x1 - x2)
        seg = F.lit(y1) + frac * F.lit(y2 - y1)
        expr = F.when(lat > F.lit(x2), seg).otherwise(expr)
    return expr


def climatology_mean(lat: Column, month: Column) -> Column:
    """Latitude/season mean-temperature guess (reference mean_temp,
    src/range_check.cpp:95-143)."""
    mt = _piecewise(lat, _MEAN_LATS, _MEAN_TEMPS)
    sv = _piecewise(lat, _VAR_LATS, _VAR_AMPS)
    factor = F.lit(0.0)
    for m, f in _MONTH_FACTOR.items():
        factor = F.when(month == m, F.lit(f)).otherwise(factor)
    return mt + (sv / 2.0) * factor


def range_check_climatology(
    df: DataFrame,
    pos,
    neg,
    unixtime: int,
    value_col: str = "value",
    lat_col: str = "lat",
    flag_col: str = "flags",
) -> DataFrame:
    """Flag values outside [clim_mean + neg, clim_mean + pos].

    Reference src/range_check.cpp:48-92: `pos`/`neg` are offsets added to
    the interpolated climatological mean; note neg is added (callers pass a
    negative number), matching `mean_neg = t + neg`.
    """
    import datetime

    month = datetime.datetime.utcfromtimestamp(unixtime).month
    t = climatology_mean(F.col(lat_col).cast("double"), F.lit(month))
    v = F.col(value_col)
    # NB: Spark orders NaN ABOVE every double (unlike IEEE, where any
    # comparison with NaN is false), so the reference's NaN-climatology ->
    # never-flag behavior needs an explicit isnan guard
    bad = is_invalid_value(v) | (
        ~F.isnan(t) & ((v < (t + _as_col(neg))) | (v > (t + _as_col(pos))))
    )
    return apply_check_flags(df, F.when(bad, BAD).otherwise(GOOD), flag_col)
