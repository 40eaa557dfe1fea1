"""FGT — First-Guess Test: score observations against a background field.

Reference src/fgt.cpp:780-923 (decision core). Per neighborhood group:

* chi = |yo - yb| / sigma_b for every row;
* summary stats (median mu, IQR sigma, sigma_mu = sigma/sqrt(n)) computed
  over rows whose background lies in the *admissible* band [mina, maxa];
  if no row qualifies, ALL tested rows in the group are flagged bad
  (src/fgt.cpp:842-849);
* basic mode: z = chi; advanced: z = (chi - mu) / (sigma + sigma_mu);
* only rows whose background lies OUTSIDE the *valid* band [minv, maxv]
  are candidates (a valid background vouches for the row);
* flag ONLY the worst candidate per group per iteration, when its z
  exceeds tpos (yo >= yb) / tneg (yo < yb) — src/fgt.cpp:875-917;
* iterate until no group flags anything new.

This is the cheapest SCT-family member: pure DataFrame ops — exact
percentiles per group + a window argmax — no Python in the loop.
Group = any partition key (grid cell, host, cluster); the caller attaches
the background with `titanlib_spark.operators.background`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD, apply_check_flags, ensure_flags
from titanlib_spark.operators.range_check import is_invalid_value


def fgt(
    df: DataFrame,
    group_cols: list[str],
    tpos: float,
    tneg: float,
    basic: bool = False,
    sigma_b=1.0,
    value_col: str = "value",
    bg_col: str = "bg",
    id_col: str = "id",
    flag_col: str = "flags",
    value_mina=None,
    value_maxa=None,
    value_minv=None,
    value_maxv=None,
    num_iterations: int = 10,
) -> DataFrame:
    """`sigma_b` is a scalar or column name (background uncertainty).
    Bands default to None: admissible = everything, valid = nothing
    (every row is a candidate)."""
    df = ensure_flags(df, flag_col)
    df = apply_check_flags(
        df, F.when(is_invalid_value(F.col(value_col)), BAD).otherwise(GOOD), flag_col
    )
    sb = F.col(sigma_b) if isinstance(sigma_b, str) else F.lit(float(sigma_b))

    df = df.localCheckpoint(eager=True)
    prev_bad = df.where(F.col(flag_col) != GOOD).count()
    for _ in range(int(num_iterations)):
        good = df.where(F.col(flag_col) == GOOD)
        dev = F.abs(F.col(value_col) - F.col(bg_col))
        # sigma_b = 0 (per-row background uncertainty): dev/0 would abort
        # under ANSI mode; keep the IEEE reading — any deviation over zero
        # uncertainty is infinitely suspicious (sorts worst), while a
        # zero/zero row is unscorable (NULL: out of stats and verdicts).
        # A NULL sigma_b stays NULL (unknown uncertainty is not zero
        # uncertainty — the inf branch is reserved for sb == 0 exactly).
        chi = F.when(sb > 0, dev / sb).otherwise(
            F.when(sb.isNotNull() & (dev > 0), F.lit(float("inf")))
        )
        scored = good.withColumn("_chi", chi)

        admissible = F.lit(True)
        if value_mina is not None:
            admissible = admissible & (F.col(bg_col) >= float(value_mina))
        if value_maxa is not None:
            admissible = admissible & (F.col(bg_col) <= float(value_maxa))
        scored = scored.withColumn("_adm", admissible)

        stats = (
            scored.where(F.col("_adm"))
            .groupBy(*group_cols)
            .agg(
                F.expr("percentile(_chi, 0.5)").alias("_mu"),
                (
                    F.expr("percentile(_chi, 0.75)") - F.expr("percentile(_chi, 0.25)")
                ).alias("_sigma"),
                # count the same population the percentiles see (non-NULL
                # chi): an sb=0,dev=0 row is unscorable and must not
                # inflate the sqrt(n) term
                F.count(F.col("_chi")).alias("_n_stat"),
            )
        )
        joined = scored.join(stats, on=group_cols, how="left")

        if basic:
            z = F.col("_chi")
        else:
            # sigma == 0 (degenerate group, src/fgt.cpp:862-866) must not
            # evaluate the division: under ANSI mode a zero divisor aborts
            # the whole job even for rows the `testable` gate would drop
            z = F.when(
                F.col("_sigma") > 0,
                (F.col("_chi") - F.col("_mu")) / (
                    F.col("_sigma") + F.col("_sigma") / F.sqrt(F.col("_n_stat"))
                ),
            )
        joined = joined.withColumn("_z", z)

        # candidates: background outside the valid band (or no valid band)
        candidate = F.lit(True)
        if value_minv is not None and value_maxv is not None:
            candidate = (F.col(bg_col) < float(value_minv)) | (
                F.col(bg_col) > float(value_maxv)
            )
        thr = F.when(F.col(value_col) >= F.col(bg_col), F.lit(float(tpos))).otherwise(
            F.lit(float(tneg))
        )
        # degenerate group (sigma==0 or no stats) -> cannot test (src/fgt.cpp:862-866)
        testable = F.col("_mu").isNotNull() & (basic | (F.col("_sigma") > 0))

        # chi_stat-empty rule: a group with zero admissible backgrounds flags
        # every row (src/fgt.cpp:842-849)
        group_has_stat = F.col("_n_stat").isNotNull()

        ranked = (
            joined.withColumn("_cand", candidate)
            .withColumn(
                "_rank",
                F.row_number().over(
                    Window.partitionBy(*group_cols).orderBy(
                        F.col("_cand").desc(), F.col("_z").desc(), F.col(id_col).asc()
                    )
                ),
            )
        )
        verdict = (
            (~group_has_stat)
            | (
                testable
                & F.col("_cand")
                & (F.col("_rank") == 1)
                & (F.col("_z") > thr)
            )
        )
        flagged_ids = ranked.where(verdict).select(
            F.col(id_col), F.lit(1).alias("_fgt_bad")
        )
        new_df = df.join(flagged_ids, on=id_col, how="left")
        new_df = apply_check_flags(
            new_df,
            F.when(F.col("_fgt_bad") == 1, BAD).otherwise(GOOD),
            flag_col,
        ).drop("_fgt_bad")
        new_df = new_df.localCheckpoint(eager=True)
        # one count per round: carry the previous total
        n_bad = new_df.where(F.col(flag_col) != GOOD).count()
        df = new_df
        if n_bad == prev_bad:
            break
        prev_bad = n_bad
    return df
