"""QCDataset — ordered check composition with monotone flag accumulation.

Mirrors the reference's mutable Dataset (reference include/titanlib.h:611-771,
src/dataset.cpp:7-26) as an immutable wrapper over a DataFrame: each check
is a DataFrame -> DataFrame transform; flags only ever move 0 -> nonzero.
Scenario-2 semantics (neighbor-dependent checks see all unflagged rows even
outside the requested subset, src/dataset.cpp:18-26) fall out naturally:
every operator here computes neighborhoods over flags==0 rows and merges
verdicts back by row id.

Recommended order (the reference's own guidance, src/sct_resistant.cpp:188-190):
metadata -> range -> duplicate -> isolation -> buddy -> SCT family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titanlib_spark.flags import FLAG_COL, GOOD, ensure_flags


class QCDataset:
    def __init__(self, df: DataFrame, flag_col: str = FLAG_COL, id_col: str | None = None):
        self.flag_col = flag_col
        self.df = ensure_flags(df, flag_col)
        self.id_col = id_col or self.df.columns[0]
        self._history: list[str] = []

    def apply(
        self,
        name: str,
        check: Callable[[DataFrame], DataFrame],
        indices=None,
    ) -> "QCDataset":
        """Run one check stage. `check` must preserve monotone flag merge
        (use titanlib_spark.flags.apply_check_flags).

        `indices` restricts which rows may RECEIVE new flags (reference
        Dataset.merge(new_flags, indices), src/dataset.cpp:177-204): the
        check still computes over the full unflagged network, but rows
        outside `indices` keep their previous flag. Accepts a list of ids
        or a single-column DataFrame of ids; None = all rows."""
        new_df = check(self.df)
        if indices is not None:
            idc = self.id_col
            prev = self.df.select(
                F.col(idc), F.col(self.flag_col).alias("_prev_flag")
            )
            if isinstance(indices, DataFrame):
                marker = indices.select(
                    F.col(indices.columns[0]).alias(idc), F.lit(True).alias("_in_idx")
                ).distinct()
                joined = new_df.join(prev, on=idc).join(
                    F.broadcast(marker), on=idc, how="left"
                )
                in_idx = F.coalesce(F.col("_in_idx"), F.lit(False))
            else:
                joined = new_df.join(prev, on=idc)
                in_idx = (
                    F.col(idc).isin(list(indices)) if len(indices) else F.lit(False)
                )
            new_df = joined.withColumn(
                self.flag_col,
                F.when(in_idx, F.col(self.flag_col)).otherwise(F.col("_prev_flag")),
            ).drop("_prev_flag", "_in_idx")
        out = QCDataset(new_df, self.flag_col, self.id_col)
        out._history = [*self._history, name]
        return out

    @property
    def history(self) -> list[str]:
        return list(self._history)

    def flags(self) -> DataFrame:
        return self.df.select(self.df.columns[0], self.flag_col)

    def good(self) -> DataFrame:
        return self.df.where(F.col(self.flag_col) == GOOD)

    def summary(self) -> DataFrame:
        """Per-flag-code row counts (the keep/drop metrics surface)."""
        return self.df.groupBy(self.flag_col).count().orderBy(self.flag_col)
