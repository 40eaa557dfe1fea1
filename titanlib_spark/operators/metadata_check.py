"""Metadata check — flag rows with missing/NaN coordinate metadata.

Reference src/metadata_check.cpp:5-26: four independently toggleable
null-tests (lat, lon, elev, laf). Pure column expression.

Webtext recast: the same operator applied to (url, html, text, lang)
nullability — see titanlib_spark.webtext.pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD, apply_check_flags
from titanlib_spark.operators.range_check import is_invalid_value


def metadata_check(
    df: DataFrame,
    check_cols: dict[str, bool] | list[str],
    flag_col: str = "flags",
) -> DataFrame:
    """Flag rows where any enabled column is null/NaN.

    `check_cols`: list of column names, or {col: enabled} mapping
    (mirrors the reference's check_lat/check_lon/check_elev/check_laf
    booleans).
    """
    if isinstance(check_cols, dict):
        cols = [c for c, on in check_cols.items() if on]
    else:
        cols = list(check_cols)
    bad = F.lit(False)
    for c in cols:
        col = F.col(c)
        dtype = dict(df.dtypes).get(c, "")
        if dtype in ("double", "float"):
            bad = bad | is_invalid_value(col)
        else:
            bad = bad | col.isNull()
    return apply_check_flags(df, F.when(bad, BAD).otherwise(GOOD), flag_col)
