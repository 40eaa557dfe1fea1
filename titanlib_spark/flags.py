"""QC flag vocabulary and merge semantics.

Flag codes follow the reference's vocabulary (reference
include/titanlib.h:132, src/sct_resistant.cpp:120-125):

* 0    — good
* 1    — bad
* 11   — isolated inside inner radius (untestable, accept_isolated=false)
* 12   — isolated inside outer radius (untestable)
* 100  — matrix-inversion / numeric failure in the SCT family
* -999 — not (yet) checked

Merge is an OR-semilattice: flags accumulate monotonically and a check can
never un-flag a row (reference src/dataset.cpp:189-192 — `merge` only
touches rows whose current flag is 0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GOOD = 0
BAD = 1
ISOLATED_INNER = 11
ISOLATED_OUTER = 12
FAILED_INVERSION = 100
UNCHECKED = -999

FLAG_COL = "flags"


def merge_flags(old: Column, new: Column) -> Column:
    """Monotone flag merge: rows already flagged keep their flag."""
    return F.when(old == GOOD, new).otherwise(old)


def apply_check_flags(
    df: DataFrame,
    check_flag: Column,
    flag_col: str = FLAG_COL,
) -> DataFrame:
    """Fold a per-check flag column into the running `flags` column.

    `check_flag` is evaluated for every row but only takes effect on rows
    currently GOOD (scenario-1 merge, reference src/dataset.cpp:206-220).
    """
    if flag_col not in df.columns:
        df = df.withColumn(flag_col, F.lit(GOOD))
    return df.withColumn(flag_col, merge_flags(F.col(flag_col), check_flag))


def ensure_flags(df: DataFrame, flag_col: str = FLAG_COL) -> DataFrame:
    if flag_col not in df.columns:
        df = df.withColumn(flag_col, F.lit(GOOD))
    return df
