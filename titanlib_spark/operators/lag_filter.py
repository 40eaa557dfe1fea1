"""Lag-reduction filter — per-key ordered recursive smoothing.

Reference src/lag_reduction_filter.cpp:5-29 (McCarthy 1973): a strictly
sequential recurrence over a time-ordered series with n sub-steps per
interval. No Spark SQL primitive expresses this recurrence; the idiomatic
distributed form is one grouped pandas UDF per series key, with the exact
scalar recurrence in numpy inside. Partitioning is by series key — the
parallel unit is the key, matching a 100 TB layout of many independent
series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _lag_filter_np(
    times: np.ndarray, values: np.ndarray, a: float, b: float, k1: float, k2: float, n: int
) -> np.ndarray:
    result = np.empty_like(values, dtype=float)
    result[0] = values[0]
    for i in range(1, len(times)):
        curr = result[i - 1]
        f0, f1 = values[i - 1], values[i]
        prev = curr
        time_diff = times[i] - times[i - 1]
        deriv1 = (f1 - f0) / time_diff
        deriv2 = 0.0
        dt = 1.0 / n
        for ti in range(n):
            t = (ti + 1) * dt
            fi = f0 + t * (f1 - f0)
            F0 = 1.0 / (a * k1 + b * k2) * (deriv2 + (k1 + k2) * deriv1 + k1 * k2 * (fi - curr))
            fi = f0 + (t + dt) * (f1 - f0)
            F1 = 1.0 / (a * k1 + b * k2) * (deriv2 + (k1 + k2) * deriv1 + k1 * k2 * (fi - curr))
            curr = prev + dt / 2 * (F0 + F1)
            prev = curr
        result[i] = curr
    return result


def lag_reduction_filter(
    df: DataFrame,
    a: float,
    b: float,
    k1: float,
    k2: float,
    n: int,
    key_cols: list[str],
    time_col: str = "time",
    value_col: str = "value",
    out_col: str = "filtered",
) -> DataFrame:
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType())])

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        pdf[out_col] = _lag_filter_np(
            pdf[time_col].to_numpy(dtype=float),
            pdf[value_col].to_numpy(dtype=float),
            a,
            b,
            k1,
            k2,
            n,
        )
        return pdf

    return df.groupBy(*key_cols).applyInPandas(apply, schema=schema)
