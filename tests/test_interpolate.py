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


ADVERSARIAL_PATTERNS = [
    # (name, value sequence) — the null shapes that break naive fills
    ("all_null", [None, None, None, None]),
    ("single_value", [None, 7.0, None, None]),
    ("leading_run", [None, None, None, 1.0, 2.0]),
    ("trailing_run", [1.0, 2.0, None, None, None]),
    ("alternating", [None, 1.0, None, 3.0, None, 5.0, None]),
    ("sandwich", [None, 4.0, None, None, None, -2.0, None]),
    ("no_nulls", [1.0, 2.0, 3.0]),
    ("one_row_null", [None]),
    ("one_row_value", [5.0]),
    ("huge_gap", [0.0] + [None] * 40 + [8.0]),
    ("negative_zero", [-0.0, None, 0.0]),
    ("tiny_values", [1e-300, None, 3e-300]),
    ("big_values", [1e300, None, -1e300]),
]


def test_window_form_matches_pandas_fallback_on_adversarial_patterns(spark):
    """SURVEY §5 escape hatch: the pure-window form and the
    applyInPandas exact-compat fallback must agree bit-for-bit with
    each other AND with a direct pandas re-derivation on every
    adversarial null pattern."""
    from bbdc20_submission_spark.operators.interpolate import (
        interpolate_linear_pandas,
    )

    rows = []
    for g, (_, seq) in enumerate(ADVERSARIAL_PATTERNS):
        rows.extend((g, i, v) for i, v in enumerate(seq))
    df = spark.createDataFrame(rows, "g long, pos long, v double")

    window_out = {
        (r["g"], r["pos"]): r["v"]
        for r in interpolate_linear(df, ["g"], ["pos"], ["v"]).collect()
    }
    pandas_out = {
        (r["g"], r["pos"]): r["v"]
        for r in interpolate_linear_pandas(df, ["g"], ["pos"], ["v"]).collect()
    }
    assert window_out.keys() == pandas_out.keys()

    pdf = pd.DataFrame(rows, columns=["g", "pos", "v"])
    for g, grp in pdf.groupby("g"):
        name = ADVERSARIAL_PATTERNS[g][0]
        expected = (
            grp.sort_values("pos")["v"].interpolate(method="linear").fillna(0.0)
        )
        for pos, want in zip(grp.sort_values("pos")["pos"], expected):
            wv, pv = window_out[(g, pos)], pandas_out[(g, pos)]
            # the fallback IS pandas -> exact equality expected
            assert pv == want or (np.isnan(want) and pv == 0.0), (name, pos, pv, want)
            assert wv == pytest.approx(want, abs=0.0, rel=1e-12) or wv == want, (
                name,
                pos,
                wv,
                want,
            )
