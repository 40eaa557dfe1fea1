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
    "__version__",
]
