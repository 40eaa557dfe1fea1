"""Small Dataset-level checks: dem_check, external_check.

Reference src/dataset.cpp:153-171.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD, apply_check_flags, ensure_flags


def dem_check(
    df: DataFrame,
    max_elev_diff: float,
    dem_col: str = "dem",
    elev_col: str = "elev",
    flag_col: str = "flags",
) -> DataFrame:
    """Flag rows where |elev - dem| > max_elev_diff (reference
    src/dataset.cpp:153-161). Join the DEM reference column beforehand
    (broadcast join for a small DEM table)."""
    bad = F.abs(F.col(elev_col) - F.col(dem_col)) > float(max_elev_diff)
    return apply_check_flags(df, F.when(bad, BAD).otherwise(GOOD), flag_col)


def external_check(
    df: DataFrame,
    ext_flag_col: str,
    flag_col: str = "flags",
) -> DataFrame:
    """OR user-supplied flags into the running flags (reference
    src/dataset.cpp:162-171): rows currently GOOD adopt the external
    verdict; rows already flagged keep their flag."""
    df = ensure_flags(df, flag_col)
    return apply_check_flags(
        df,
        F.when(F.col(ext_flag_col) != GOOD, BAD).otherwise(GOOD),
        flag_col,
    )
