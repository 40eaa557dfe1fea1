"""Reference YAML golden corpus, ported as parametrized pytest data.

Transcribed from the reference's bulk-test fixtures
(tests/files/{range_check,isolation_check,metadata_check,duplicate_check,
buddy_check,nan_dataset}.yml, driven by tests/bulk_test.py) — the
reference's densest NaN-edge-case net. Each case is (dataset columns,
operator, kwargs, expected flag vector); vector args of length 1 are
broadcast scalars, length-N vectors become per-row columns (the
reference's length-N convention).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from titanlib_spark.operators.buddy_check import buddy_check
from titanlib_spark.operators.duplicate_check import duplicate_check_spatial
from titanlib_spark.operators.isolation_check import isolation_check
from titanlib_spark.operators.metadata_check import metadata_check
from titanlib_spark.operators.range_check import range_check

NAN = float("nan")

# --- tests/files/range_check.yml -------------------------------------------
RANGE_NORMAL = dict(
    lats=[0, 1, 2, NAN, NAN, 5, 6, 7, 8],
    lons=[0, 1, 2, 3, 4, NAN, NAN, 7, 8],
    elevs=[0, 1, 2, 3, 4, 5, 6, NAN, NAN],
    values=[0, 1, NAN, 0, NAN, 1, NAN, 1, NAN],
)
# --- tests/files/isolation_check.yml + nan_dataset.yml ----------------------
ISO_NORMAL = RANGE_NORMAL
ISO_ALLNAN = dict(lats=[NAN] * 3, lons=[NAN] * 3, elevs=[NAN] * 3, values=[0, 1, 2])
NAN_DATASET = dict(lats=[NAN], lons=[NAN], elevs=[NAN], values=[NAN])
EMPTY = dict(lats=[], lons=[], elevs=[], values=[])
# --- tests/files/duplicate_check.yml ----------------------------------------
DUP_NORMAL = dict(
    lats=[0, 0, 0, 0, 1, 1.001, 1],
    lons=[0, 0, 0, 1, 1, 1.001, 0],
    elevs=[0, 0, 1, 0, 0, 0, 0],
    values=[0, 1, 2, 3, 4, 5, 6],
)
DUP_NAN_ELEV = dict(
    lats=[0, 0, 0, 1, 1, 1],
    lons=[0, 0, 0, 1, 1, 1],
    elevs=[NAN, 0, 100, 0, NAN, 100],
    values=[0, 1, 2, 3, 4, 5],
)
DUP_NAN_POS = dict(
    lats=[0, NAN, 0, 1, 1, 1],
    lons=[0, 0, 0, 1, 1, NAN],
    elevs=[0, 0, 0, 0, 0, 0],
    values=[0, 1, 2, 3, 4, 5],
)
# --- tests/files/metadata_check.yml ------------------------------------------
META = dict(
    lats=[60, NAN, 62, 63, 64],
    lons=[10, 11, NAN, 13, 14],
    elevs=[0, 0, 0, NAN, 0],
    lafs=[0, 0, 0, 0, NAN],
)
# --- tests/files/buddy_check.yml ---------------------------------------------
BUDDY = dict(
    lats=[60] * 10,
    lons=[10.001, 10.002, 10.003, 10.004, 10.005, 10.006, 10.007, 10.008,
          10.009, 10.01],
    elevs=[0] * 10,
    values=[0, 0, 0, 0, 0, 0, 0, 0, 0.1, 1],
)
BUDDY_KW = dict(
    radius=10000.0, num_min=1, threshold=1.0, max_elev_diff=200.0,
    elev_gradient=-0.0065, min_std=0.01, num_iterations=2,
)


def _df(spark, data, extra=None):
    cols = ["lats", "lons", "elevs"] + (["values"] if "values" in data else []) + (
        ["lafs"] if "lafs" in data else []
    )
    names = {"lats": "lat", "lons": "lon", "elevs": "elev", "values": "value",
             "lafs": "laf"}
    n = len(data["lats"])
    rows = [
        tuple([i] + [float(data[c][i]) for c in cols]) for i in range(n)
    ]
    schema = StructType(
        [StructField("id", LongType())]
        + [StructField(names[c], DoubleType()) for c in cols]
    )
    df = spark.createDataFrame(rows, schema)
    for name, vec in (extra or {}).items():
        lut = F.array(*[F.lit(float(v)) for v in vec])
        df = df.withColumn(name, lut[F.col("id").cast("int")])
    return df


def _flags(out):
    got = {r.id: r.flags for r in out.select("id", "flags").collect()}
    return [got[i] for i in sorted(got)]


RANGE_CASES = [
    # (data, vmin, vmax, expected)
    (RANGE_NORMAL, [0], [0.5], [0, 1, 1, 0, 1, 1, 1, 1, 1]),
    (RANGE_NORMAL, [1] * 9, [1, 1, 3, 3, 1, 1, 1, 1, 1], [1, 0, 1, 1, 1, 0, 1, 0, 1]),
    (NAN_DATASET, [0], [0.5], [1]),
    (EMPTY, [0], [0.5], []),
]


@pytest.mark.parametrize("data,vmin,vmax,expected", RANGE_CASES)
def test_yaml_range_check(spark, data, vmin, vmax, expected):
    extra = {}
    vmin_arg = float(vmin[0]) if len(vmin) == 1 else "vmin"
    vmax_arg = float(vmax[0]) if len(vmax) == 1 else "vmax"
    if vmin_arg == "vmin":
        extra["vmin"] = vmin
    if vmax_arg == "vmax":
        extra["vmax"] = vmax
    df = _df(spark, data, extra)
    assert _flags(range_check(df, vmin_arg, vmax_arg)) == expected


ISO_CASES = [
    # (data, num_min, radius, vertical_radius, expected)
    (ISO_NORMAL, 1, 160000.0, None, [0, 0, 0, 1, 1, 1, 1, 0, 0]),
    (ISO_NORMAL, 1, 160000.0, 100.0, [0, 0, 0, 1, 1, 1, 1, 1, 1]),
    (EMPTY, 1, 160000.0, None, []),
    (ISO_ALLNAN, 1, 160000.0, None, [1, 1, 1]),
    (NAN_DATASET, 1, 160000.0, None, [1]),
]


@pytest.mark.parametrize("data,num_min,radius,vrad,expected", ISO_CASES)
def test_yaml_isolation_check(spark, data, num_min, radius, vrad, expected):
    df = _df(spark, data)
    out = isolation_check(df, num_min=num_min, radius=radius, vertical_radius=vrad)
    assert _flags(out) == expected


DUP_CASES = [
    # (data, radius, vertical_range, expected)
    (DUP_NORMAL, 10000.0, None, [0, 1, 1, 0, 0, 1, 0]),
    (DUP_NORMAL, 1.0, None, [0, 1, 1, 0, 0, 0, 0]),
    (DUP_NORMAL, 10000.0, 0.0, [0, 1, 0, 0, 0, 1, 0]),
    (DUP_NAN_ELEV, 10000.0, 50.0, [1, 0, 0, 0, 1, 0]),
    (DUP_NAN_POS, 10000.0, 50.0, [0, 0, 1, 0, 1, 0]),
]


@pytest.mark.parametrize("data,radius,vrange,expected", DUP_CASES)
def test_yaml_duplicate_check(spark, data, radius, vrange, expected):
    df = _df(spark, data)
    out = duplicate_check_spatial(df, radius=radius, vertical_range=vrange)
    assert _flags(out) == expected


META_CASES = [
    # (disabled, expected)
    (None, [0, 1, 1, 1, 1]),
    ("lat", [0, 0, 1, 1, 1]),
    ("lon", [0, 1, 0, 1, 1]),
    ("elev", [0, 1, 1, 0, 1]),
    ("laf", [0, 1, 1, 1, 0]),
]


@pytest.mark.parametrize("disabled,expected", META_CASES)
def test_yaml_metadata_check(spark, disabled, expected):
    df = _df(spark, META)
    checks = {c: c != disabled for c in ("lat", "lon", "elev", "laf")}
    assert _flags(metadata_check(df, checks)) == expected


BUDDY_CASES = [
    # (overrides, expected)
    ({}, [0, 0, 0, 0, 0, 0, 0, 0, 1, 1]),
    ({"min_std": 0.3}, [0, 0, 0, 0, 0, 0, 0, 0, 0, 1]),
    ({"min_std": 1.0}, [0, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
    ({"num_min": 20}, [0, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
]


@pytest.mark.parametrize("overrides,expected", BUDDY_CASES)
def test_yaml_buddy_check(spark, overrides, expected):
    df = _df(spark, BUDDY)
    kw = dict(BUDDY_KW, **overrides)
    assert _flags(buddy_check(df, **kw)) == expected
