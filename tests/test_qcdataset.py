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
