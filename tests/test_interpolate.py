"""W7 interpolation must match pandas interpolate(linear).fillna(0)
(the reference's load_data.py:95 semantics) on random null patterns."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from bbdc20_submission_spark.operators.interpolate import interpolate_linear


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_pandas_reference(spark, seed):
    rng = random.Random(seed)
    rows = []
    for g in range(3):
        n = rng.randrange(5, 30)
        for i in range(n):
            v = None if rng.random() < 0.35 else round(rng.uniform(-10, 10), 3)
            rows.append((g, i, v))
    df = spark.createDataFrame(rows, "g long, pos long, v double")
    got = {
        (r["g"], r["pos"]): r["v"]
        for r in interpolate_linear(df, ["g"], ["pos"], ["v"]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "pos", "v"])
    for g, grp in pdf.groupby("g"):
        expected = (
            grp.sort_values("pos")["v"].interpolate(method="linear").fillna(0.0)
        )
        for pos, want in zip(grp.sort_values("pos")["pos"], expected):
            have = got[(g, pos)]
            assert have == pytest.approx(want, abs=1e-9), (g, pos, have, want)


def test_all_null_group_becomes_zero(spark):
    df = spark.createDataFrame(
        [(0, 0, None), (0, 1, None)], "g long, pos long, v double"
    )
    out = interpolate_linear(df, ["g"], ["pos"], ["v"]).collect()
    assert all(r["v"] == 0.0 for r in out)
