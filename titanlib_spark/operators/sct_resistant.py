"""SCT-resistant — outlier-resistant spatial consistency test.

Distributed recast of reference src/sct_resistant.cpp:26-1062. The
reference's architecture maps as:

* hierarchical index sets global -> outer -> inner -> test
  (src/util.cpp:232-295): Spark grid cells (side = outer_radius) with a
  27-cell halo give every core point its full outer circle inside one
  ``applyInPandas`` group; inner/test membership is decided in-kernel;
* 5 background modes (enum BackgroundType, include/titanlib.h:49-55):
  mean / median of the outer circle, vertical-profile fit,
  Theil-Sen fit, external column — the numpy kernels from
  titanlib_spark.operators.background;
* adaptive horizontal decorrelation length: mean over the outer circle of
  each row's distance to its kth_closest neighbor, clamped to
  [min_horizontal_scale, max_horizontal_scale]
  (src/sct_resistant.cpp:882-912);
* OI analysis and leave-one-out cross-validation analysis; score
  chi = sqrt((yo-ya)(yo-yav)) (src/sct_resistant.cpp:971);
* ``basic`` mode tests chi directly; advanced mode normalizes
  z = (chi - median) / (IQR + IQR/sqrt(n)) over admissible rows
  (src/sct_resistant.cpp:992-1011);
* valid value band short-circuits candidacy (an observation whose value
  AND background both look plausible is vouched for,
  src/sct_resistant.cpp:353-372); admissible band gates which rows feed
  the robust statistics;
* flags only the single WORST offender per centroid per pass
  (src/sct_resistant.cpp:1033-1058) — the iterate-until-stable driver
  loop then re-tests everything against the cleaned network;
* flag vocabulary: 0 good, 1 bad, 11/12 isolated (accept_isolated=false),
  100 matrix-inversion failure (src/sct_resistant.cpp:120-125,380-384).

Documented deviations from the reference (same as operators/sct.py): the
centroid sweep is per-cell rather than global, so which centroid settles a
row first can differ — the reference is explicitly order-tolerant here —
and the phase-2/3 re-sweeps (src/sct_resistant.cpp:416-712) are subsumed
by the iterate-until-stable loop over cells (every still-unflagged row is
re-tested each round against the cleaned network).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titanlib_spark.flags import (
    BAD,
    FAILED_INVERSION,
    GOOD,
    ISOLATED_INNER,
    ISOLATED_OUTER,
    apply_check_flags,
    ensure_flags,
)
from titanlib_spark.functions.geo import with_ecef
from titanlib_spark.operators.background import (
    exact_quantile,
    theil_sen_np,
    vertical_profile_np,
)
from titanlib_spark.operators.range_check import is_invalid_value
from titanlib_spark.operators.sct import _geodetic_dist_matrix


def _background_box(mode, elevs, values, ext, num_min_prof, min_elev_diff,
                    value_minp, value_maxp):
    if mode == "external":
        vp = ext.astype(float)
    elif mode == "mean_outer_circle":
        vp = np.full(values.size, float(np.mean(values)))
    elif mode == "median_outer_circle":
        vp = np.full(values.size, exact_quantile(0.5, values))
    elif mode == "vertical_profile":
        vp = vertical_profile_np(elevs, values, num_min_prof, min_elev_diff)
    elif mode == "vertical_profile_theil_sen":
        vp = theil_sen_np(elevs, values, num_min_prof, min_elev_diff)
    else:
        raise ValueError(f"unknown background mode: {mode}")
    if value_minp is not None:
        vp = np.maximum(vp, value_minp)
    if value_maxp is not None:
        vp = np.minimum(vp, value_maxp)
    return vp


def _sct_resistant_kernel(
    pdf: pd.DataFrame,
    *,
    background_elab_type: str,
    num_min_outer: int,
    num_max_outer: int,
    inner_radius: float,
    outer_radius: float,
    num_min_prof: int,
    min_elev_diff: float,
    min_horizontal_scale: float,
    max_horizontal_scale: float,
    kth_closest: int,
    vertical_scale: float,
    value_mina,
    value_maxa,
    value_minv,
    value_maxv,
    eps2: float,
    tpos: float,
    tneg: float,
    basic: bool,
    accept_isolated: bool,
) -> pd.DataFrame:
    ids = pdf["_sid"].to_numpy()
    lats = pdf["_slat"].to_numpy(dtype=float)
    lons = pdf["_slon"].to_numpy(dtype=float)
    elevs = pdf["_selev"].to_numpy(dtype=float)
    values = pdf["_svalue"].to_numpy(dtype=float)
    to_test = pdf["_stest"].to_numpy(dtype=bool)
    core = pdf["_score"].to_numpy(dtype=bool)
    ext = pdf["_sbg"].to_numpy(dtype=float)
    pts = np.stack(
        [pdf["_sx"].to_numpy(float), pdf["_sy"].to_numpy(float), pdf["_sz"].to_numpy(float)],
        axis=1,
    )
    n = len(ids)
    flags = np.full(n, -1, dtype=np.int32)  # -1 = no verdict from this cell
    scores = np.full(n, np.nan)
    settled = np.zeros(n, dtype=bool)

    order = np.argsort(ids, kind="stable")
    alive = np.ones(n, dtype=bool)  # rows flagged earlier in THIS sweep drop
    for curr in order:              # out of later neighborhoods — the
        # reference mutates flags live during its sequential sweep, so a
        # found gross error never pollutes subsequent centroids' OI
        if not core[curr] or not to_test[curr] or settled[curr] or flags[curr] > 0:
            continue
        d_chord = np.sqrt(((pts - pts[curr]) ** 2).sum(axis=1))
        sel = np.where((d_chord <= outer_radius) & alive)[0]
        if sel.size < num_min_outer:
            # isolated: 11 inside the inner radius, 12 only-outer
            if not accept_isolated:
                flags[curr] = (
                    ISOLATED_INNER if d_chord[curr] <= inner_radius else ISOLATED_OUTER
                )
                alive[curr] = False
            settled[curr] = True
            continue
        if sel.size > num_max_outer:
            k = np.lexsort((ids[sel], d_chord[sel]))[:num_max_outer]
            sel = sel[k]

        e_box, v_box = elevs[sel], values[sel]
        try:
            vp = _background_box(
                background_elab_type, e_box, v_box, ext[sel],
                num_min_prof, min_elev_diff, None, None,
            )
        except Exception:
            settled[curr] = True
            continue

        disth = _geodetic_dist_matrix(lats[sel], lons[sel])
        distz = np.abs(e_box[:, None] - e_box[None, :])
        s_box = sel.size
        # adaptive Dh: mean of per-row kth-closest distances, clamped
        kth = min(max(int(kth_closest), 1), s_box - 1)
        sorted_rows = np.sort(disth, axis=1)
        dh_mean = float(np.mean(sorted_rows[:, kth]))
        dh_mean = min(max(dh_mean, float(min_horizontal_scale)), float(max_horizontal_scale))

        S = np.exp(-0.5 * (disth / dh_mean) ** 2 - 0.5 * (distz / vertical_scale) ** 2)
        S[np.diag_indices(s_box)] += eps2
        d = v_box - vp
        try:
            Sinv = np.linalg.inv(S)
        except np.linalg.LinAlgError:
            flags[curr] = FAILED_INVERSION  # src/sct_resistant.cpp:380-384
            settled[curr] = True
            alive[curr] = False
            continue
        S[np.diag_indices(s_box)] -= eps2

        Sinv_d = Sinv @ d
        ya = vp + S @ Sinv_d                    # analysis
        yav = v_box - (1.0 / np.diag(Sinv)) * Sinv_d  # cv-analysis
        chi = np.sqrt(np.maximum((v_box - ya) * (v_box - yav), 0.0))

        # admissible band selects rows feeding the robust statistics
        adm = np.ones(s_box, dtype=bool)
        if value_mina is not None:
            adm &= vp >= value_mina
        if value_maxa is not None:
            adm &= vp <= value_maxa
        if basic:
            zscore = chi.copy()
        else:
            chi_adm = chi[adm]
            if chi_adm.size == 0:
                settled[curr] = True
                continue
            mu = exact_quantile(0.5, chi_adm)
            iqr = exact_quantile(0.75, chi_adm) - exact_quantile(0.25, chi_adm)
            denom = iqr + iqr / np.sqrt(chi_adm.size)
            if denom <= 0:
                settled[curr] = True
                continue
            zscore = (chi - mu) / denom

        dists = d_chord[sel]
        in_inner = dists <= inner_radius
        cand = in_inner & core[sel] & to_test[sel] & ~settled[sel]
        # valid band vouches (src/sct_resistant.cpp:353-372)
        if value_minv is not None and value_maxv is not None:
            vouched = (v_box >= value_minv) & (v_box <= value_maxv) & (
                vp >= value_minv
            ) & (vp <= value_maxv)
            cand &= ~vouched
        thr = np.where(v_box >= vp, tpos, tneg)
        offending = cand & (zscore > thr)

        for i in range(s_box):
            idx = sel[i]
            if in_inner[i] and core[idx]:
                prev = scores[idx]
                scores[idx] = zscore[i] if np.isnan(prev) else max(prev, zscore[i])

        if offending.any():
            # single worst offender per centroid pass (:1033-1058)
            worst_local = int(np.argmax(np.where(offending, zscore, -np.inf)))
            flags[sel[worst_local]] = BAD
            settled[sel[worst_local]] = True
            alive[sel[worst_local]] = False
            # everything else in this circle is re-tested next pass
        else:
            # circle is consistent: all inner candidates settle as good
            for i in range(s_box):
                if in_inner[i] and cand[i]:
                    settled[sel[i]] = True
        settled[curr] = True

    keep = core & (flags >= 0)
    good_settled = core & settled & (flags < 0)
    return pd.DataFrame(
        {
            "_sid": np.concatenate([ids[keep], ids[good_settled]]),
            "_flag": np.concatenate(
                [flags[keep], np.zeros(int(good_settled.sum()), dtype=np.int32)]
            ),
            "score": np.concatenate([scores[keep], scores[good_settled]]),
        }
    )


def sct_resistant(
    df: DataFrame,
    background_elab_type: str = "median_outer_circle",
    num_min_outer: int = 3,
    num_max_outer: int = 50,
    inner_radius: float = 20000.0,
    outer_radius: float = 50000.0,
    num_iterations: int = 10,
    num_min_prof: int = 10,
    min_elev_diff: float = 500.0,
    min_horizontal_scale: float = 250.0,
    max_horizontal_scale: float = 100000.0,
    kth_closest: int = 2,
    vertical_scale: float = 200.0,
    value_mina: float | None = None,
    value_maxa: float | None = None,
    value_minv: float | None = None,
    value_maxv: float | None = None,
    eps2: float = 0.5,
    tpos: float = 3.0,
    tneg: float = 3.0,
    basic: bool = False,
    accept_isolated: bool = True,
    obs_to_check: str | None = None,
    background_col: str | None = None,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    elev_col: str = "elev",
    value_col: str = "value",
    flag_col: str = "flags",
) -> DataFrame:
    """Returns df with `flags` updated (0/1/11/12/100 vocabulary) and a
    per-row `score` column (the chi/z diagnostic, reference `scores`)."""
    df = ensure_flags(df, flag_col)
    df = apply_check_flags(
        df, F.when(is_invalid_value(F.col(value_col)), BAD).otherwise(GOOD), flag_col
    )
    kernel_kwargs = dict(
        background_elab_type=background_elab_type,
        num_min_outer=num_min_outer,
        num_max_outer=num_max_outer,
        inner_radius=inner_radius,
        outer_radius=outer_radius,
        num_min_prof=num_min_prof,
        min_elev_diff=min_elev_diff,
        min_horizontal_scale=min_horizontal_scale,
        max_horizontal_scale=max_horizontal_scale,
        kth_closest=kth_closest,
        vertical_scale=vertical_scale,
        value_mina=value_mina,
        value_maxa=value_maxa,
        value_minv=value_minv,
        value_maxv=value_maxv,
        eps2=eps2,
        tpos=tpos,
        tneg=tneg,
        basic=basic,
        accept_isolated=accept_isolated,
    )

    df = df.withColumn("score", F.lit(None).cast("double"))
    prev_bad = None
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
            (
                F.col(obs_to_check).cast("boolean")
                if obs_to_check
                else F.lit(True)
            ).alias("_stest"),
            (
                F.col(background_col).cast("double")
                if background_col
                else F.lit(None).cast("double")
            ).alias("_sbg"),
            F.col("x").alias("_sx"),
            F.col("y").alias("_sy"),
            F.col("z").alias("_sz"),
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
                "_score_flag",
                (F.col("_o.dx") == 0) & (F.col("_o.dy") == 0) & (F.col("_o.dz") == 0),
            )
            .select(
                "_sid", "_slat", "_slon", "_selev", "_svalue", "_stest", "_sbg",
                "_sx", "_sy", "_sz",
                (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
                (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
                (F.col("_cz") + F.col("_o.dz")).alias("_cz"),
                F.col("_score_flag").alias("_score"),
            )
        )

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            return _sct_resistant_kernel(pdf, **kernel_kwargs)

        verdicts = replicated.groupBy("_cx", "_cy", "_cz").applyInPandas(
            run, schema="_sid long, _flag int, score double"
        )
        updates = verdicts.select(
            F.col("_sid").alias(id_col),
            F.col("_flag").alias("_new_flag"),
            F.col("score").alias("_new_score"),
        )
        joined = df.join(updates, on=id_col, how="left")
        joined = joined.withColumn(
            "score", F.coalesce(F.col("_new_score"), F.col("score"))
        )
        joined = apply_check_flags(
            joined,
            F.coalesce(F.col("_new_flag"), F.lit(GOOD)),
            flag_col,
        ).drop("_new_flag", "_new_score")
        joined = joined.localCheckpoint(eager=True)
        new_bad = joined.where(F.col(flag_col) != GOOD).count()
        df = joined
        if prev_bad is not None and new_bad == prev_bad:
            break
        prev_bad = new_bad
    return df
