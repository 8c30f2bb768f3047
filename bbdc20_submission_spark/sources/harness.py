"""Readers for the driver-generated harness tables (TESTDATA.md).

Parquet scans: Catalyst pushes column pruning and predicates into the
scan (check ``.explain`` for ``PushedFilters`` / ``ReadSchema``), so
callers should filter/select on the returned DataFrame directly rather
than pre-materializing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HARNESS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one harness table. Schema comes from parquet footer metadata.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as a long (legacy conf) and
    rebuild a proper TimestampType with exact integer division (nanos
    don't fit double precision, so no float math here).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read all harness tables into a name -> DataFrame dict."""
    return {name: load_table(spark, name, sf_dir) for name in HARNESS_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql can use it."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
