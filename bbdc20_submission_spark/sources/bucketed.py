"""Bucketed-table layout: shuffle-free co-located joins at 100 TB.

A join between two huge fact tables shuffles both sides on every run.
Writing them ONCE as bucketed tables (``bucketBy(n, keys)`` +
``sortBy``) pins a hash-partitioned, sorted layout in the catalog, and
every later equi-join or aggregation on the bucket keys runs with NO
exchange — the classic pay-the-shuffle-once trade for tables joined
repeatedly (fact-to-fact joins, incremental pipelines).

Notes for real deployments:
- bucket count is a layout-time decision: pick ``n_buckets`` so one
  bucket of the BIGGER table fits an executor core's working set
  (~128-512 MB of parquet per bucket);
- both sides must be bucketed with the SAME count and keys for the
  exchange to be elided;
- ``spark.sql.sources.bucketing.enabled`` (default true) must be on,
  and reads must go through the catalog (``spark.table``), not raw
  paths — path reads lose the bucket metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    n_buckets: int,
    sort_keys: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog-managed bucketed parquet table.

    ``sort_keys`` default to the bucket keys: sorted buckets let
    sort-merge joins skip their sort and window scans start pre-ordered.
    """
    sort_keys = list(sort_keys or bucket_keys)
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_keys)
        .sortBy(*sort_keys)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (catalog path —
    a raw ``spark.read.parquet`` of the same files would forget the
    layout and reintroduce shuffles)."""
    return spark.table(table)
