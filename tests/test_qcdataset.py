"""QCDataset — ordered check composition (reference Dataset semantics:
src/dataset.cpp:18-26, flags accumulate monotonically)."""

from __future__ import annotations

from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD
from titanlib_spark.operators import isolation_check, metadata_check, range_check
from titanlib_spark.pipeline import QCDataset


def test_composition_and_history(spark):
    rows = [
        (0, 60.0, 10.0, 5.0),
        (1, 60.001, 10.0, 500.0),   # out of range
        (2, None, 10.0, 5.0),       # bad metadata
        (3, 60.002, 10.0, 6.0),
        (4, 20.0, 40.0, 7.0),       # isolated
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double, value double")
    ds = QCDataset(df)
    ds = ds.apply("metadata", lambda d: metadata_check(d, ["lat", "lon"]))
    ds = ds.apply("range", lambda d: range_check(d, 0.0, 100.0))
    ds = ds.apply(
        "isolation", lambda d: isolation_check(d, num_min=1, radius=1000.0)
    )
    assert ds.history == ["metadata", "range", "isolation"]
    flags = {r.id: r.flags for r in ds.df.collect()}
    assert flags == {0: GOOD, 1: BAD, 2: BAD, 3: GOOD, 4: BAD}
    assert {r.id for r in ds.good().collect()} == {0, 3}
    summary = {r["flags"]: r["count"] for r in ds.summary().collect()}
    assert summary == {GOOD: 2, BAD: 3}


def test_monotone_flags_never_unset(spark):
    df = spark.createDataFrame([(0, 500.0), (1, 5.0)], "id long, value double")
    ds = QCDataset(df).apply("r1", lambda d: range_check(d, 0.0, 100.0))
    # a later, laxer check must not clear the earlier verdict
    ds = ds.apply("r2", lambda d: range_check(d, 0.0, 1000.0))
    flags = {r.id: r.flags for r in ds.df.collect()}
    assert flags == {0: BAD, 1: GOOD}


def test_indices_restricted_merge(spark):
    """reference tests/dataset_test.py:25-31 + :43-46: the check runs over
    the full network but only `indices` rows may receive new flags."""
    from titanlib_spark.operators import range_check

    rows = [(i, 0.0) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, value double")
    ds = QCDataset(df)

    def rc(frame):
        return range_check(frame, -100.0, -100.0)

    ds1 = ds.apply("range[0,1,2]", rc, indices=[0, 1, 2])
    flags1 = {r.id: r.flags for r in ds1.flags().collect()}
    assert [flags1[i] for i in range(5)] == [1, 1, 1, 0, 0]

    ds2 = ds1.apply("range[1,2,4]", rc, indices=[1, 2, 4])
    flags2 = {r.id: r.flags for r in ds2.flags().collect()}
    assert [flags2[i] for i in range(5)] == [1, 1, 1, 0, 1]

    # empty indices: nothing changes (dataset_test.py:43-46)
    ds3 = ds.apply("range[]", rc, indices=[])
    flags3 = {r.id: r.flags for r in ds3.flags().collect()}
    assert [flags3[i] for i in range(5)] == [0, 0, 0, 0, 0]

    # DataFrame-typed indices behave like the list form
    idx_df = spark.createDataFrame([(0,), (4,)], "id long")
    ds4 = ds.apply("range[df]", rc, indices=idx_df)
    flags4 = {r.id: r.flags for r in ds4.flags().collect()}
    assert [flags4[i] for i in range(5)] == [1, 0, 0, 0, 1]


def test_calc_distance_fast_matches_reference_formula(spark):
    """reference src/kdtree.cpp:185-203 equirectangular approximation."""
    import math

    from titanlib_spark.functions.geo import calc_distance_fast

    df = spark.createDataFrame(
        [(60.0, 10.0, 60.1, 10.2), (0.0, 0.0, 1.0, 1.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = df.select(
        calc_distance_fast(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for row, (lat1, lon1, lat2, lon2) in zip(got, [(60.0, 10.0, 60.1, 10.2), (0.0, 0.0, 1.0, 1.0)]):
        lat1r, lat2r = math.radians(lat1), math.radians(lat2)
        lon1r, lon2r = math.radians(lon1), math.radians(lon2)
        dx2 = math.cos((lat1r + lat2r) / 2) ** 2 * (lon1r - lon2r) ** 2
        dy2 = (lat1r - lat2r) ** 2
        want = 6.37e6 * math.sqrt(dx2 + dy2)
        assert abs(row.d - want) < 1e-6
