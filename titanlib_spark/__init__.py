"""titanlib_spark — a PySpark-native quality-control / quality-filter engine.

A from-scratch re-expression of the capabilities of metno/titanlib
(reference: /root/reference, studied for semantics only) as idiomatic
PySpark: every QC check is a DataFrame -> DataFrame transform; spatial
neighborhoods are grid-bucketed self-joins; linear-algebra kernels (SCT)
run as Arrow-vectorized grouped pandas UDFs; the webtext recast applies
the same check architecture to Common-Crawl-style page tables
(langid + quality heuristics + outlier scoring + PII/toxicity scrub).

Nothing here is a code port: the reference is single-process C++ with
OpenMP loops (reference src/buddy_check.cpp:75); this engine declares
logical plans with the DataFrame API and lets Catalyst/AQE pick physical
strategy, designed for 1000-executor / 100 TB scale.
"""

from titanlib_spark.flags import (
    GOOD,
    BAD,
    ISOLATED_INNER,
    ISOLATED_OUTER,
    FAILED_INVERSION,
    UNCHECKED,
    merge_flags,
)
from titanlib_spark.session import get_spark

# the reference exposes every check at package level (titanlib.buddy_check
# et al., reference include/titanlib.h) — mirror that call surface so a
# titanlib user can switch with an import swap
from titanlib_spark.operators import (
    background,
    buddy_check,
    buddy_event_check,
    dem_check,
    duplicate_check_exact,
    duplicate_check_spatial,
    external_check,
    fgt,
    isolation_check,
    lag_reduction_filter,
    metadata_check,
    range_check,
    range_check_climatology,
    sct,
    sct_dual,
    sct_resistant,
)
from titanlib_spark.pipeline import QCDataset

__version__ = "0.1.0"

__all__ = [
    "GOOD",
    "BAD",
    "ISOLATED_INNER",
    "ISOLATED_OUTER",
    "FAILED_INVERSION",
    "UNCHECKED",
    "merge_flags",
    "get_spark",
    "QCDataset",
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
    "dem_check",
    "external_check",
    "lag_reduction_filter",
    "sct",
    "sct_dual",
    "sct_resistant",
    "__version__",
]
