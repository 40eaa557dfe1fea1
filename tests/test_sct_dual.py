"""sct_dual unit tests — dichotomous consistency (mirrors the reference's
seeded-error framing: tests/sct_dual_test.py plants class-flip errors and
checks recovery)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from titanlib_spark.flags import BAD, GOOD
from titanlib_spark.operators import sct_dual


def test_single_class_shortcut(spark):
    """All-same-class neighborhoods pass untouched (src/sct_dual.cpp:330-344)."""
    rows = [(i, 60.0 + 0.001 * i, 10.0, 0.0, 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double, elev double, value double")
    out = sct_dual(
        df, event_threshold=5.0, condition="Lt", test_threshold=0.1,
        outer_radius=10000.0, num_iterations=1,
    )
    assert all(r.flags == GOOD for r in out.collect())


def test_class_flip_outlier_flagged(spark):
    """A dense yes-class field with isolated no-class intruders: the
    intruders disagree with their whole neighborhood and get flagged over
    iterations; conforming rows survive."""
    rng = np.random.default_rng(9)
    rows = []
    flipped = {17, 53}
    for i in range(80):
        r, c = divmod(i, 10)
        # value below 5 -> event (w=1) under Lt; conformers ~1, intruders ~9
        val = 1.0 + float(rng.uniform(0, 0.5))
        if i in flipped:
            val = 9.0
        rows.append((i, 60.0 + r * 0.003, 10.0 + c * 0.003, 0.0, val))
    df = spark.createDataFrame(rows, "id long, lat double, lon double, elev double, value double")
    out = sct_dual(
        df, event_threshold=5.0, condition="Lt", test_threshold=0.05,
        outer_radius=5000.0, num_iterations=5,
    )
    flags = {r.id: r.flags for r in out.collect()}
    assert all(flags[i] == BAD for i in flipped), flags
    false_pos = [i for i, f in flags.items() if f == BAD and i not in flipped]
    assert len(false_pos) <= 2, false_pos


def test_condition_vocabulary(spark):
    df = spark.createDataFrame(
        [(0, 60.0, 10.0, 0.0, 5.0)], "id long, lat double, lon double, elev double, value double"
    )
    for cond in ("Eq", "Gt", "Geq", "Lt", "Leq"):
        out = sct_dual(
            df, event_threshold=5.0, condition=cond, test_threshold=0.1,
            outer_radius=1000.0, num_iterations=1,
        )
        assert out.count() == 1
    with pytest.raises(Exception):
        sct_dual(
            df, event_threshold=5.0, condition="bogus", test_threshold=0.1,
            outer_radius=1000.0, num_iterations=1,
        ).collect()
