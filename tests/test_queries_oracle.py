"""Every declared query with an oracle hash-matches DuckDB locally.

This mirrors the driver's t2 gate (at sf0.001 by default for speed;
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the real thing).
"""

from __future__ import annotations

import pytest

from bbdc20_submission_spark import registry
from tests.oracle_check import check_query

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_oracle_match(spark, sf_dir, name):
    rows = check_query(spark, sf_dir, name)
    assert rows >= 0


def test_every_query_has_an_oracle():
    """Rows-only queries no longer exist — every registered query must
    carry a DuckDB oracle (the strongest driver certification class)."""
    assert set(registry.QUERIES) == set(registry.ORACLE)


def test_asof_join_strict_excludes_equal_ts(spark):
    """asof_join strict=True must not match a right row at the exact
    same timestamp (ties visible only in non-strict mode)."""
    from bbdc20_submission_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10.0), (1, 20.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, 10.0, "at10"), (1, 15.0, "at15")], "k long, rts double, tag string"
    )
    loose = {
        (r["ts"], r["tag_asof"])
        for r in asof_join(left, right, ["k"], "ts", "rts", ["tag"]).collect()
    }
    strict = {
        (r["ts"], r["tag_asof"])
        for r in asof_join(left, right, ["k"], "ts", "rts", ["tag"], strict=True).collect()
    }
    assert loose == {(10.0, "at10"), (20.0, "at15")}
    assert strict == {(10.0, None), (20.0, "at15")}
