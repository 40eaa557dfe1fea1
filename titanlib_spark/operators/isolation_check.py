"""Isolation check — flag points with too few neighbors.

Reference src/isolation_check.cpp:31-92: a row is flagged when
* its lat/lon is invalid, or
* (with vertical_radius) its elev is invalid, or
* fewer than `num_min` neighbors lie within `radius` (chord distance,
  excluding the point itself / coordinate-identical points), optionally
  restricted to neighbors whose |elev diff| <= vertical_radius.

Spark plan: grid-bucketed self-join (one shuffle on cell id) ->
groupBy(id).count() -> left join of counts back (isolated points produce
no pair rows, hence the left join + coalesce(0)).

Neighbors are counted among ALL located points regardless of their flags —
the reference operates on a bare Points set; flag-pushdown (running only on
unflagged rows) is the caller's composition choice (src/dataset.cpp:222-241).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD, apply_check_flags
from titanlib_spark.functions.geo import undirected_neighbor_pairs
from titanlib_spark.operators.range_check import is_invalid_value


def isolation_check(
    df: DataFrame,
    num_min: int,
    radius: float,
    vertical_radius: float | None = None,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    elev_col: str = "elev",
    flag_col: str = "flags",
    coord_type: str = "geodetic",
    cell_size: float | None = None,
) -> DataFrame:
    bad_coord = is_invalid_value(F.col(lat_col)) | is_invalid_value(F.col(lon_col))
    if vertical_radius is not None:
        bad_coord = bad_coord | is_invalid_value(F.col(elev_col))

    located = df.where(~(is_invalid_value(F.col(lat_col)) | is_invalid_value(F.col(lon_col))))
    carry = (elev_col,) if vertical_radius is not None else ()
    und, _, per_row_radius = undirected_neighbor_pairs(
        located,
        radius,
        id_col=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
        carry_cols=carry,
        include_self=False,
        coord_type=coord_type,
        cell_size=cell_size,
    )
    if vertical_radius is not None:
        # symmetric vertical gate on the UNDIRECTED row: if either elev is
        # invalid the |diff| comparison is false and the pair drops for
        # BOTH directions — exactly the reference's exclusion (an
        # invalid-elev row is flagged by bad_coord regardless)
        und = und.where(
            F.abs(F.col(f"_pa_{elev_col}") - F.col(f"_pb_{elev_col}"))
            <= float(vertical_radius)
        )
    ida, idb = F.col("_ida"), F.col("_idb")
    if per_row_radius:
        # a direction only counts within ITS query row's radius; NULL ids
        # are dropped before the count
        ida = F.when(F.col("dist") <= F.col("_ra"), ida)
        idb = F.when(F.col("dist") <= F.col("_rb"), idb)
    counted = und.select(F.explode(F.array(ida, idb)).alias(id_col)).where(
        F.col(id_col).isNotNull()
    )
    counts = counted.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_neigh"))

    out = df.join(counts, on=id_col, how="left").withColumn(
        "_n_neigh", F.coalesce(F.col("_n_neigh"), F.lit(0))
    )
    bad = bad_coord | (F.col("_n_neigh") < int(num_min))
    out = apply_check_flags(out, F.when(bad, BAD).otherwise(GOOD), flag_col)
    return out.drop("_n_neigh")
