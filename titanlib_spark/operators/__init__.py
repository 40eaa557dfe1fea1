"""QC check operators — each is a DataFrame -> DataFrame transform that
folds its verdict into the monotone `flags` column (see titanlib_spark.flags).
"""

from titanlib_spark.operators.range_check import range_check, range_check_climatology
from titanlib_spark.operators.metadata_check import metadata_check
from titanlib_spark.operators.isolation_check import isolation_check
from titanlib_spark.operators.duplicate_check import (
    duplicate_check_exact,
    duplicate_check_spatial,
)
from titanlib_spark.operators.buddy_check import buddy_check
from titanlib_spark.operators.buddy_event_check import buddy_event_check
from titanlib_spark.operators.background import background
from titanlib_spark.operators.fgt import fgt, fgt_spatial
from titanlib_spark.operators.misc import dem_check, external_check
from titanlib_spark.operators.lag_filter import lag_reduction_filter
from titanlib_spark.operators.sct import sct
from titanlib_spark.operators.sct_dual import sct_dual
from titanlib_spark.operators.sct_resistant import sct_resistant

__all__ = [
    "range_check",
    "range_check_climatology",
    "metadata_check",
    "isolation_check",
    "duplicate_check_exact",
    "duplicate_check_spatial",
    "buddy_check",
    "buddy_event_check",
    "background",
    "fgt",
    "fgt_spatial",
    "dem_check",
    "external_check",
    "lag_reduction_filter",
    "sct",
    "sct_dual",
    "sct_resistant",
]
