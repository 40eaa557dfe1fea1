"""duplicate_check_spatial — reference-parity greedy first-wins dedup
(reference src/duplicate_check.cpp:7-56, fixtures tests/files/duplicate_check.yml)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD
from titanlib_spark.operators import duplicate_check_spatial


def _flags(out):
    return {r.id: r.flags for r in out.collect()}


def test_radius_first_wins(spark):
    rows = [
        (0, 60.0, 10.0, 0.0),
        (1, 60.0004, 10.0, 0.0),   # ~45 m from 0 -> duplicate of 0
        (2, 60.05, 10.0, 0.0),     # ~5.5 km away -> kept
        (3, 60.0006, 10.0, 0.0),   # ~67 m from 0 -> duplicate too
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double, elev double")
    out = duplicate_check_spatial(df, radius=1000.0)
    assert _flags(out) == {0: GOOD, 1: BAD, 2: GOOD, 3: BAD}


def test_chain_is_greedy_not_transitive(spark):
    """B within radius of A, C within radius of B but NOT of A: greedy
    first-wins keeps A, drops B; C is then kept (its only in-radius
    neighbor was already checked) — the order-dependent semantics the
    reference documents as non-parallelizable (src/duplicate_check.cpp:24)."""
    rows = [
        (0, 60.0, 10.0, 0.0),
        (1, 60.008, 10.0, 0.0),   # ~890 m from A (in radius)
        (2, 60.016, 10.0, 0.0),   # ~890 m from B, ~1780 m from A
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double, elev double")
    out = duplicate_check_spatial(df, radius=1000.0)
    assert _flags(out) == {0: GOOD, 1: BAD, 2: GOOD}


def test_vertical_range(spark):
    rows = [
        (0, 60.0, 10.0, 100.0),
        (1, 60.0004, 10.0, 150.0),  # close + within 100 m elev -> dup
        (2, 60.0006, 10.0, 900.0),  # close but 800 m above -> kept
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double, elev double")
    out = duplicate_check_spatial(df, radius=1000.0, vertical_range=100.0)
    assert _flags(out) == {0: GOOD, 1: BAD, 2: GOOD}


def test_nan_elev_flagged_with_vertical_range(spark):
    """With vertical_range, invalid-elevation rows are pre-marked checked
    and end up flagged (reference initializes flags to 1 and only clears
    kept rows, src/duplicate_check.cpp:17-22,49-54)."""
    rows = [
        (0, 60.0, 10.0, 100.0),
        (1, 60.0004, 10.0, float("nan")),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double, elev double")
    out = duplicate_check_spatial(df, radius=1000.0, vertical_range=100.0)
    assert _flags(out) == {0: GOOD, 1: BAD}
