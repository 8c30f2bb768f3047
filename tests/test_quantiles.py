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
