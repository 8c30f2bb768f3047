"""exact_percentile must be bit-equal to the builtin exact percentile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bbdc20_submission_spark.operators.quantiles import exact_percentile
from bbdc20_submission_spark.sources.harness import load_table


@pytest.mark.parametrize("p", [0.0, 0.25, 0.5, 0.85, 1.0])
def test_matches_builtin_on_lineitem(spark, sf_dir, p):
    li = load_table(spark, "lineitem", sf_dir)
    want = li.agg(F.expr(f"percentile(l_extendedprice, {p})").alias("x")).collect()[0]["x"]
    got = exact_percentile(li, "l_extendedprice", p)
    assert got == pytest.approx(want, rel=0, abs=0), (got, want)


def test_handles_tiny_and_null_inputs(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    assert exact_percentile(df, "v", 0.5) == 2.0
    one = spark.createDataFrame([(7.0,)], "v double")
    assert exact_percentile(one, "v", 0.9) == 7.0
    empty = spark.createDataFrame([], "v double")
    assert exact_percentile(empty, "v", 0.5) is None


@pytest.mark.parametrize("p", [0.0, 0.25, 0.5, 0.85, 1.0])
def test_lazy_frame_matches_builtin(spark, sf_dir, p):
    """exact_percentile_frame: the LAZY single-plan variant must be
    bit-equal to the builtin when the returned frame is executed."""
    from bbdc20_submission_spark.operators.quantiles import exact_percentile_frame

    li = load_table(spark, "lineitem", sf_dir)
    want = li.agg(F.expr(f"percentile(l_extendedprice, {p})").alias("x")).collect()[0]["x"]
    got = exact_percentile_frame(li, "l_extendedprice", p).collect()[0]["pct"]
    assert got == pytest.approx(want, rel=0, abs=0), (got, want)


def test_lazy_frame_is_lazy_and_handles_edges(spark):
    """Building the frame must execute nothing (the r5 advice point:
    a7's old form ran the percentile at plan-build time); edge inputs
    match the eager operator."""
    from unittest.mock import patch

    from pyspark.sql import DataFrame

    from bbdc20_submission_spark.operators.quantiles import exact_percentile_frame

    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    with patch.object(DataFrame, "collect", side_effect=AssertionError("eager!")):
        frame = exact_percentile_frame(df, "v", 0.5)
    assert frame.collect()[0]["pct"] == 2.0
    one = spark.createDataFrame([(7.0,)], "v double")
    assert exact_percentile_frame(one, "v", 0.9).collect()[0]["pct"] == 7.0
    empty = spark.createDataFrame([], "v double")
    assert exact_percentile_frame(empty, "v", 0.5).collect()[0]["pct"] is None


@pytest.mark.parametrize("p", [0.0, 0.5, 0.9])
def test_grouped_two_pass_matches_builtin(spark, sf_dir, p):
    """exact_percentile_by (bracketed two-pass per group) must be
    bit-equal to the builtin grouped percentile — the few-groups/
    huge-groups scale shape."""
    from bbdc20_submission_spark.operators.quantiles import exact_percentile_by

    li = load_table(spark, "lineitem", sf_dir)
    want = {
        r["l_returnflag"]: r["m"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr(f"percentile(l_extendedprice, {p})").alias("m"))
        .collect()
    }
    got = dict(exact_percentile_by(li, ["l_returnflag"], "l_extendedprice", p))
    assert got == want


def test_grouped_two_pass_guards_group_cardinality(spark, sf_dir):
    from bbdc20_submission_spark.operators.quantiles import exact_percentile_by

    li = load_table(spark, "lineitem", sf_dir)
    with pytest.raises(ValueError, match="max_groups"):
        exact_percentile_by(li, ["l_orderkey"], "l_extendedprice", 0.5, max_groups=5)


def test_lazy_frame_random_inputs_match_builtin(spark):
    """Randomized pin for exact_percentile_frame: many seeded value
    sets x percentiles, every result bit-equal to the builtin
    percentile (covers duplicate-heavy, skewed, and tiny inputs)."""
    import random

    from bbdc20_submission_spark.operators.quantiles import exact_percentile_frame

    rng = random.Random(99)
    for case in range(6):
        n = rng.choice([3, 17, 101, 1500])
        vals = [
            round(rng.gauss(0, 1000), rng.choice([0, 2, 6])) for _ in range(n)
        ]
        if case % 2:  # duplicate-heavy variant
            vals = [rng.choice(vals[: max(3, n // 10)]) for _ in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        for p in (0.0, 0.37, 0.5, 0.93, 1.0):
            want = df.agg(
                F.expr(f"percentile(v, {p})").alias("x")
            ).collect()[0]["x"]
            got = exact_percentile_frame(df, "v", p).collect()[0]["pct"]
            assert got == want, (case, p, got, want)


def test_duplicate_endpoint_short_circuit(spark):
    """r6 regression: when both interpolation endpoints are the same
    duplicated value, builtin percentile (and quantile_cont) return it
    EXACTLY; a*(1-f)+a*f re-rounds into a±1ulp. All three operator
    forms must short-circuit."""
    from bbdc20_submission_spark.operators.quantiles import (
        exact_percentile,
        exact_percentile_by,
        exact_percentile_frame,
    )

    vals = [-208.9, -208.9, -208.9, 5.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    want = df.agg(F.expr("percentile(v, 0.37)").alias("x")).collect()[0]["x"]
    assert want == -208.9
    assert exact_percentile(df, "v", 0.37) == want
    assert exact_percentile_frame(df, "v", 0.37).collect()[0]["pct"] == want
    g = spark.createDataFrame([(1, v) for v in vals], "k long, v double")
    assert exact_percentile_by(g, ["k"], "v", 0.37) == [(1, want)]


def test_exact_percentile_by_null_group_and_p_guard(spark):
    """A NULL group key is a group like any other (null-safe bracket
    join — a plain equi-join silently dropped it); out-of-range p must
    raise instead of looping forever."""
    import pytest

    from bbdc20_submission_spark.operators.quantiles import (
        exact_percentile,
        exact_percentile_by,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 5.0), (None, 7.0)],
        "g string, x double",
    )
    got = exact_percentile_by(df, ["g"], "x", 0.5)
    assert got == [("a", 1.5), (None, 6.0)]

    with pytest.raises(ValueError, match="outside"):
        exact_percentile_by(df, ["g"], "x", 1.5)
    with pytest.raises(ValueError, match="outside"):
        exact_percentile(df, "x", -0.1)
    # n == 1 path returns a float even for integer columns
    one = spark.createDataFrame([(7,)], "x long")
    v = exact_percentile(one, "x", 0.5)
    assert v == 7.0 and isinstance(v, float)
