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


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
