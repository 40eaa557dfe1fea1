"""SCT-dual — spatial consistency test for dichotomous (event) variables.

Reference src/sct_dual.cpp:25-1014. Values are thresholded into events
w in {0,1} via a ConditionType (Eq/Gt/Geq/Lt/Leq, src/sct_dual.cpp:176-188).
Per neighborhood: if the outer circle is single-class, all rows pass
(:330-344); otherwise build the Gaussian covariance over the outer points
(Dh = mean of per-row distance to the kth-closest neighbor, clamped to
[min,max] horizontal scale, :855-875), split into the w=0 / w=1
subnetworks, invert each, and compute per test row the leave-one-out
integral data influence of its own class,
``own_idiv = 1 - rowsum(Sinv_own)/diag(Sinv_own)`` (clamped to 0.001),
and the cross-class influence ``other_idiv = S[i, others] @ rowsum-vector``
(:946-985). A row is a candidate bad when its own class is less supported
and the information content ``z = other*log(other/own)`` exceeds its
threshold t; only the worst candidate per neighborhood per pass is flagged
(:986-1010); skip rows whose both idivs < 0.45 (w_idiv_min, :784).

Spark recast: same cell+halo partitioning as `sct`; kernel in numpy per
cell; driver loop with early stop. Deviation (documented): neighborhoods
are grid cells (side = outer_radius) rather than per-centroid circles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD, apply_check_flags, ensure_flags
from titanlib_spark.functions.geo import with_ecef
from titanlib_spark.operators.range_check import is_invalid_value
from titanlib_spark.operators.sct import _geodetic_dist_matrix

_W_IDIV_MIN = 0.45  # reference src/sct_dual.cpp:784


def _event(values: np.ndarray, thr: float, condition: str) -> np.ndarray:
    if condition == "Eq":
        return (values == thr).astype(int)
    if condition == "Gt":
        return (values > thr).astype(int)
    if condition == "Geq":
        return (values >= thr).astype(int)
    if condition == "Lt":
        return (values < thr).astype(int)
    if condition == "Leq":
        return (values <= thr).astype(int)
    raise ValueError(condition)


def _sct_dual_kernel(
    pdf: pd.DataFrame,
    event_threshold: float,
    condition: str,
    test_threshold: float,
    min_horizontal_scale: float,
    max_horizontal_scale: float,
    kth_closest: int,
    vertical_scale: float,
    eps2: float,
) -> pd.DataFrame:
    ids = pdf["_sid"].to_numpy()
    lats = pdf["_slat"].to_numpy(dtype=float)
    lons = pdf["_slon"].to_numpy(dtype=float)
    elevs = pdf["_selev"].to_numpy(dtype=float)
    values = pdf["_svalue"].to_numpy(dtype=float)
    core = pdf["_score"].to_numpy(dtype=bool)
    n = len(ids)
    w = _event(values, event_threshold, condition)

    flags = np.zeros(n, dtype=np.int32)
    core_idx = np.where(core)[0]
    if core_idx.size == 0:
        return pd.DataFrame({"_sid": ids[core], "_flag": flags[core]})

    # single-class shortcut (src/sct_dual.cpp:330-344)
    if w.sum() == 0 or w.sum() == n:
        return pd.DataFrame({"_sid": ids[core], "_flag": flags[core]})

    disth = _geodetic_dist_matrix(lats, lons)
    distz = np.abs(elevs[:, None] - elevs[None, :])
    k = min(kth_closest, n - 1)
    dh_rows = np.sort(disth, axis=1)[:, k]  # distance to kth closest (excl self at col 0)
    dh_mean = float(np.mean(dh_rows))
    dh_mean = min(max(dh_mean, min_horizontal_scale), max_horizontal_scale)

    S = np.exp(-0.5 * (disth / dh_mean) ** 2 - 0.5 * (distz / vertical_scale) ** 2)

    i0 = np.where(w == 0)[0]
    i1 = np.where(w == 1)[0]
    S0 = S[np.ix_(i0, i0)] + eps2 * np.eye(i0.size)
    S1 = S[np.ix_(i1, i1)] + eps2 * np.eye(i1.size)
    try:
        Sinv0 = np.linalg.inv(S0)
        Sinv1 = np.linalg.inv(S1)
    except np.linalg.LinAlgError:
        return pd.DataFrame({"_sid": ids[core], "_flag": flags[core]})

    rowsum0 = Sinv0.sum(axis=1)
    rowsum1 = Sinv1.sum(axis=1)

    pos0 = {g: k_ for k_, g in enumerate(i0)}
    pos1 = {g: k_ for k_, g in enumerate(i1)}

    zmx, mmx = None, None
    for i in core_idx:
        if w[i] == 1:
            own = 1.0 - rowsum1[pos1[i]] / Sinv1[pos1[i], pos1[i]]
            own = own if own > 0 else 0.001
            other = float(S[i, i0] @ rowsum0)
        else:
            own = 1.0 - rowsum0[pos0[i]] / Sinv0[pos0[i], pos0[i]]
            own = own if own > 0 else 0.001
            other = float(S[i, i1] @ rowsum1)
        if own < _W_IDIV_MIN and other < _W_IDIV_MIN:
            continue
        if other <= 0:
            continue
        z = other * np.log(other / own)
        if other > own and z > test_threshold:
            if zmx is None or z > zmx:
                zmx, mmx = z, i
    if mmx is not None:
        flags[mmx] = BAD
    return pd.DataFrame({"_sid": ids[core], "_flag": flags[core]})


def sct_dual(
    df: DataFrame,
    event_threshold: float,
    condition: str,
    test_threshold: float,
    outer_radius: float,
    num_iterations: int = 1,
    min_horizontal_scale: float = 250.0,
    max_horizontal_scale: float = 100000.0,
    kth_closest: int = 10,
    vertical_scale: float = 200.0,
    eps2: float = 0.5,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    elev_col: str = "elev",
    value_col: str = "value",
    flag_col: str = "flags",
) -> DataFrame:
    df = ensure_flags(df, flag_col)
    df = apply_check_flags(
        df, F.when(is_invalid_value(F.col(value_col)), BAD).otherwise(GOOD), flag_col
    )

    for _ in range(int(num_iterations)):
        unflagged = df.where(F.col(flag_col) == GOOD)
        pts = with_ecef(unflagged, lat_col, lon_col)
        cs = float(outer_radius)
        base = pts.select(
            F.col(id_col).alias("_sid"),
            F.col(lat_col).cast("double").alias("_slat"),
            F.col(lon_col).cast("double").alias("_slon"),
            F.coalesce(F.col(elev_col).cast("double"), F.lit(0.0)).alias("_selev"),
            F.col(value_col).cast("double").alias("_svalue"),
            F.floor(F.col("x") / cs).cast("int").alias("_cx"),
            F.floor(F.col("y") / cs).cast("int").alias("_cy"),
            F.floor(F.col("z") / cs).cast("int").alias("_cz"),
        )
        offsets = F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(dz).alias("dz"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)
            ]
        )
        replicated = (
            base.withColumn("_o", F.explode(offsets))
            .withColumn(
                "_score",
                (F.col("_o.dx") == 0) & (F.col("_o.dy") == 0) & (F.col("_o.dz") == 0),
            )
            .select(
                "_sid",
                "_slat",
                "_slon",
                "_selev",
                "_svalue",
                "_score",
                (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
                (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
                (F.col("_cz") + F.col("_o.dz")).alias("_cz"),
            )
        )

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return _sct_dual_kernel(
                pdf,
                event_threshold,
                condition,
                test_threshold,
                min_horizontal_scale,
                max_horizontal_scale,
                kth_closest,
                vertical_scale,
                eps2,
            )

        verdicts = replicated.groupBy("_cx", "_cy", "_cz").applyInPandas(
            kernel, schema="_sid long, _flag int"
        )
        verdicts = verdicts.select(F.col("_sid").alias(id_col), "_flag")
        joined = df.join(verdicts, on=id_col, how="left")
        new_df = apply_check_flags(
            joined, F.when(F.col("_flag") == BAD, BAD).otherwise(GOOD), flag_col
        ).drop("_flag")
        new_df = new_df.localCheckpoint(eager=True)
        thrown = (
            new_df.where(F.col(flag_col) != GOOD).count()
            - df.where(F.col(flag_col) != GOOD).count()
        )
        df = new_df
        if thrown == 0:
            break
    return df
