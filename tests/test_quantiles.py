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
