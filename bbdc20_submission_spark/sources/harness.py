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


def _events_ts_is_nanos(path: str) -> bool:
    """Footer peek: does ``events.parquet`` store ``ts`` as nanos?

    Drives whether ``load_table`` must flip the session-global
    ``nanosAsLong`` conf. On any local-read failure (remote FS, odd
    layout) fall back to ``True`` — the conf is harmless for µs
    layouts, so the fallback is the legacy always-set behavior.
    """
    try:
        import pyarrow as pa
        import pyarrow.dataset as ds

        field = ds.dataset(path, format="parquet").schema.field("ts")
        return pa.types.is_timestamp(field.type) and field.type.unit == "ns"
    except Exception:
        return True


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one harness table. Schema comes from parquet footer metadata.

    ``events.ts`` has shipped in three physical layouts across testdata
    generations; normalize all of them to a proper ``TimestampType``
    (instant semantics, UTC) so every downstream query can rely on
    ``unix_millis(ts)`` / ``withWatermark("ts", ...)`` working:

    * TIMESTAMP(NANOS) — Spark's vectorized reader rejects it; read as
      long (legacy conf) and rebuild with exact integer division (nanos
      don't fit double precision, so no float math).
    * ``timestamp[us]`` UTC-adjusted — already ``TIMESTAMP``, no-op.
    * ``timestamp[us]`` NOT UTC-adjusted — Spark 4 reads TIMESTAMP_NTZ,
      which ``unix_millis``/watermarks reject. The oracle (DuckDB)
      treats naive timestamps as UTC, so pin the session timezone to
      UTC and cast — the cast reinterprets the wall-clock fields in the
      session zone, making this an exact bit-identical mapping.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_is_nanos(path):
        # Required to read the legacy TIMESTAMP(NANOS) layout. Set only
        # when the footer actually says nanos so harness-owned sessions
        # aren't mutated for the common µs layouts.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events":
        ts_dtype = dict(df.dtypes).get("ts")
        if ts_dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_dtype == "timestamp_ntz":
            # The harness may hand us a session we didn't configure —
            # the NTZ→TIMESTAMP cast goes through the session timezone,
            # so it must be UTC for oracle-identical instants.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table_row_count(name: str, sf_dir: str = DEFAULT_SF_DIR) -> int | None:
    """Exact row count of a harness table from parquet FOOTER metadata
    only — O(number of files) driver-side reads, no Spark job, no data
    pages touched. The cheap way to size auto-scaled knobs (SemDeDup
    auto-k, sample thinning) without paying a full-scan ``count()``.
    Returns None when the path isn't locally footer-readable (remote
    FS, non-parquet source) — callers fall back to a real count."""
    try:
        import pyarrow.dataset as ds

        dataset = ds.dataset(
            os.path.join(sf_dir, f"{name}.parquet"), format="parquet"
        )
        return sum(
            frag.metadata.num_rows for frag in dataset.get_fragments()
        )
    except Exception:
        return None


def table_column_max(
    name: str, column: str, sf_dir: str = DEFAULT_SF_DIR
) -> int | None:
    """Exact maximum of an integer column from parquet row-group
    min/max STATISTICS only — footer reads, no Spark job, no data
    pages (int64 stats are exact, never truncated). What planted-
    ground-truth queries use to derive a collision-proof id offset
    (max + 1) at any data scale. Returns None when the path isn't
    footer-readable, the column is missing, or any row group lacks
    stats — callers fall back to a real max() job."""
    try:
        import pyarrow.dataset as ds

        dataset = ds.dataset(
            os.path.join(sf_dir, f"{name}.parquet"), format="parquet"
        )
        best: int | None = None
        for frag in dataset.get_fragments():
            md = frag.metadata
            names = md.schema.names
            if column not in names:
                return None
            ci = names.index(column)
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(ci).statistics
                if stats is None or not stats.has_min_max:
                    return None
                best = stats.max if best is None else max(best, stats.max)
        return best
    except Exception:
        return None


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read all harness tables into a name -> DataFrame dict."""
    return {name: load_table(spark, name, sf_dir) for name in HARNESS_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql can use it."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
